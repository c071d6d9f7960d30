"""Utilities: synthetic volumes, container file IO, profiling helpers."""

from . import io, profiling, volumes  # noqa: F401
