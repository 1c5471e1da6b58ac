"""Error handling.

Capability parity with reference `include/gunrock/error.hxx` (error_t,
exception_t, throw_if_exception): here errors are host-side Python exceptions;
device-side "errors" become sentinel values or debug checks (jax.debug) since
XLA programs cannot throw.
"""

from __future__ import annotations


class EssentialsError(RuntimeError):
    """Framework-level error (reference: gunrock::error::exception_t)."""


def throw_if(condition: bool, message: str = "") -> None:
    """Raise EssentialsError when ``condition`` is truthy.

    Reference parity: error::throw_if_exception(bool, str)
    (/root/reference/include/gunrock/error.hxx:37-45).
    """
    if condition:
        raise EssentialsError(message)
