"""Process-level default for the plain pallas interpreter.

Two ways exist to run our TPU pallas kernels on CPU:

  * ``pltpu.force_tpu_interpret_mode()`` — jax's threaded TPU *emulator*
    (interpret_pallas_call.py).  Faithful, but its shared-memory
    io_callbacks deadlock when several virtual CPU devices execute
    kernels concurrently (shard_map over an 8-device mesh: every device
    thread parks in ``_allocate_buffer``).
  * ``pallas_call(interpret=True)`` — the plain interpreter, which
    discharges the kernel to pure XLA ops.  Thread-safe under shard_map
    and measured bit-identical to the emulator for all of our kernels.

Multi-device CPU tests and the multichip dryrun therefore set this
process-level default, which the public kernel wrappers fold into their
static ``interpret`` argument.

Trace-time caveat: the default is read when the *outer* jit traces, and
outer jit caches do not key on it — flip it only around freshly created
jitted functions (tests do; see tests/test_tp.py).
"""

from __future__ import annotations

import contextlib
import contextvars
import functools

_DEFAULT = contextvars.ContextVar("pallas_interpret_default", default=False)


def interpret_default() -> bool:
    return _DEFAULT.get()


@contextlib.contextmanager
def pallas_interpret(on: bool = True):
    """Within this scope, pallas kernels default to interpret=True."""
    tok = _DEFAULT.set(on)
    try:
        yield
    finally:
        _DEFAULT.reset(tok)


def with_interpret_default(fn):
    """Outermost kernel decorator: folds the process default into the
    (static, keyword-only in practice) ``interpret`` argument so the jit
    cache keys on the resolved value."""
    @functools.wraps(fn)
    def wrapper(*args, **kw):
        if not kw.get("interpret"):
            kw["interpret"] = _DEFAULT.get()
        return fn(*args, **kw)
    return wrapper
