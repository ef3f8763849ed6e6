"""Custom column functions + UDF registration plumbing."""

from .binary import register_binary_functions  # noqa: F401
from .registration import UdfProvider, register_udfs  # noqa: F401
