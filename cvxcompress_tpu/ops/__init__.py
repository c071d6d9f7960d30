"""TPU compute ops: block layout, MXU wavelet, quantization, entropy coding."""

from . import blocks, quant, rle_device, wavelet  # noqa: F401
