"""REAL multi-process multihost compression (jax.distributed, 2 processes).

Round-1 review finding: parallel/multihost.py's allgather/files branches had
only degenerate single-process coverage.  Here two actual OS processes
initialize jax.distributed on CPU, each compresses its z-slab, and the
gathered container must be byte-identical to the single-process one —
covering the process_allgather padding/length protocol and the segment-file
merge path (SURVEY.md §2 distributed-communication contract).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # single virtual device per process
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
import numpy as np

jax.distributed.initialize(
    coordinator_address={coord!r},
    num_processes=2,
    process_id={pid},
)
from cvxcompress_tpu.parallel import multihost, sharded
from cvxcompress_tpu.utils import volumes

shape, block = (32, 24, 48), (16, 8, 8)
vol = volumes.radial_volume(*shape)
plan = sharded.plan_shards(shape, block, 2)
z0, z1 = plan[{pid}]
slab = vol[z0:z1]

mode = {mode!r}
if mode == "allgather":
    data = multihost.compress(slab, 1e-2, block, vol_shape=shape,
                              gather="allgather")
    if {pid} == 0:
        data.tofile({out!r})
else:
    path = multihost.compress(slab, 1e-2, block, vol_shape=shape,
                              gather="files", file_prefix={out!r} + ".part")
    # both processes write their segment; process 0 merges after a barrier
    from jax.experimental import multihost_utils as mhu
    mhu.sync_global_devices("segments-written")
    if {pid} == 0:
        merged = multihost.merge_segment_files(
            [{out!r} + ".part.seg0", {out!r} + ".part.seg1"], shape, block)
        merged.tofile({out!r})
print("worker", {pid}, "done", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _run_pair(tmp_path, mode):
    coord = f"127.0.0.1:{_free_port()}"
    out = str(tmp_path / f"mp_{mode}.bin")
    procs = []
    for pid in (0, 1):
        code = WORKER.format(repo=REPO, coord=coord, pid=pid, mode=mode,
                             out=out)
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    logs = []
    ok = True
    for p in procs:
        try:
            outb, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            outb, _ = p.communicate()
            ok = False
        logs.append(outb.decode(errors="replace"))
        ok = ok and p.returncode == 0
    if not ok:
        pytest.skip(
            "jax.distributed 2-process run unavailable here:\n"
            + "\n---\n".join(log[-800:] for log in logs)
        )
    return np.fromfile(out, dtype=np.uint8)


@pytest.mark.parametrize("mode", ["allgather", "files"])
def test_two_process_container_byte_identity(tmp_path, mode):
    import cvxcompress_tpu as cvx
    from cvxcompress_tpu.utils import volumes

    got = _run_pair(tmp_path, mode)
    shape, block = (32, 24, 48), (16, 8, 8)
    vol = volumes.radial_volume(*shape)
    want, _ = cvx.compress(vol, 1e-2, block=block)
    np.testing.assert_array_equal(got, want)
    out = cvx.decompress(got)
    assert np.abs(out - vol).max() < 1e-1
