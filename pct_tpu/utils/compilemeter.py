"""Per-scope compile-time attribution via jax.monitoring.

The round-4 sweep evidence (VERDICT weak #4): a 1M protocol row costs
263-1311 s of which >= 90% is XLA/Mosaic compiles of freshly-minted
bucket statics — but the committed CSVs could not DISTINGUISH compile
from compute, so every wall number read as if the framework were slow.
``CompileMeter`` sums the durations of jax's compile events
(`/jax/core/compile/{jaxpr_trace,jaxpr_to_mlir_module,backend_compile}
_duration`) inside a ``with`` scope; persistent-cache hits keep
backend_compile near zero, so meter output ~ true compile tax and a
row is honestly "warm" when it is small relative to wall.

One module-level listener feeds every active meter (they nest); the
listener is registered lazily on first use — importing this module has
no jax side effects.
"""

from __future__ import annotations

import threading

_COMPILE_EVENTS = (
    "/jax/core/compile/jaxpr_trace_duration",
    "/jax/core/compile/jaxpr_to_mlir_module_duration",
    "/jax/core/compile/backend_compile_duration",
)

_lock = threading.Lock()
_active: list["CompileMeter"] = []
_registered = False


def _listener(name: str, duration_secs: float, **_kw) -> None:
    if name not in _COMPILE_EVENTS:
        return
    with _lock:
        for m in _active:
            m.seconds += duration_secs


def _ensure_registered() -> None:
    global _registered
    if _registered:
        return
    import jax.monitoring

    jax.monitoring.register_event_duration_secs_listener(_listener)
    _registered = True


class CompileMeter:
    """``with CompileMeter() as m: ...; m.seconds`` — seconds jax spent
    tracing/lowering/backend-compiling inside the scope (cache hits
    count their ~ms lookup, not a full compile)."""

    def __init__(self) -> None:
        self.seconds = 0.0

    def __enter__(self) -> "CompileMeter":
        _ensure_registered()
        with _lock:
            _active.append(self)
        return self

    def __exit__(self, *exc) -> None:
        with _lock:
            _active.remove(self)
