"""CompileMeter unit tests (utils/compilemeter.py)."""

import jax
import jax.numpy as jnp

from pct_tpu.utils.compilemeter import CompileMeter


def test_meter_counts_fresh_compile_and_nests():
    with CompileMeter() as outer:
        with CompileMeter() as inner:
            @jax.jit
            def f(x):
                return x * 3 + jnp.sin(x)

            f(jnp.ones(64)).block_until_ready()
        after_inner = inner.seconds
    assert after_inner > 0.0            # fresh compile was metered
    assert outer.seconds >= after_inner  # nesting: both meters fed


def test_meter_near_zero_on_cached_call():
    @jax.jit
    def g(x):
        return x - 1.5

    g(jnp.ones(32)).block_until_ready()   # compile outside any meter
    with CompileMeter() as m:
        g(jnp.ones(32)).block_until_ready()
    assert m.seconds < 0.05
