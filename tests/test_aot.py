"""Client-side AOT executable cache (utils/aot.py): round-trip, key stability,
and graceful degradation."""

from functools import partial

import numpy as np
import pytest


def test_aot_call_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("SERENDIPITY_TPU_AOT", str(tmp_path))
    import jax
    import jax.numpy as jnp

    from serendipity_tpu.utils.aot import aot_call

    @partial(jax.jit, static_argnames=("k",))
    def f(x, k):
        return (x * k).sum(axis=1)

    x = jnp.arange(12.0).reshape(3, 4)
    r1 = aot_call(f, (x,), static=dict(k=3))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(f(x, k=3)))
    files = list(tmp_path.glob("*.aotx"))
    if not files:
        pytest.skip("backend does not support executable serialization")
    assert len(files) == 1
    # clear the in-process memo so the second call genuinely exercises the
    # DESERIALIZE path (the memo would otherwise short-circuit the file read)
    from serendipity_tpu.utils import aot as aot_mod

    aot_mod._loaded.clear()
    r2 = aot_call(f, (x,), static=dict(k=3))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    assert len(list(tmp_path.glob("*.aotx"))) == 1
    # different static -> different cache entry
    aot_call(f, (x,), static=dict(k=4))
    assert len(list(tmp_path.glob("*.aotx"))) == 2
    # different shape -> different cache entry
    aot_call(f, (jnp.ones((2, 4)),), static=dict(k=3))
    assert len(list(tmp_path.glob("*.aotx"))) == 3


def test_aot_call_off_by_default(tmp_path, monkeypatch):
    monkeypatch.delenv("SERENDIPITY_TPU_AOT", raising=False)
    import jax
    import jax.numpy as jnp

    from serendipity_tpu.utils.aot import aot_call

    f = jax.jit(lambda x: x + 1)
    out = aot_call(f, (jnp.zeros(3),))
    np.testing.assert_array_equal(np.asarray(out), np.ones(3))
    assert not list(tmp_path.glob("*.aotx"))


def test_aot_corrupt_cache_degrades(tmp_path, monkeypatch):
    monkeypatch.setenv("SERENDIPITY_TPU_AOT", str(tmp_path))
    import jax
    import jax.numpy as jnp

    from serendipity_tpu.utils.aot import aot_call

    from serendipity_tpu.utils import aot as aot_mod

    f = jax.jit(lambda x: x * 2)
    x = jnp.ones(4)
    aot_call(f, (x,))
    for p in tmp_path.glob("*.aotx"):
        p.write_bytes(b"garbage")
    aot_mod._loaded.clear()          # force the file-read path onto the garbage
    out = aot_call(f, (x,))          # must recompile, not crash
    np.testing.assert_array_equal(np.asarray(out), 2 * np.ones(4))


def test_aot_code_change_invalidates(tmp_path, monkeypatch):
    """Editing a function's math must MISS the old entry (the key hashes the
    source): a stale executable silently serving old results is the worst
    failure mode of an executable cache."""
    import jax
    import jax.numpy as jnp

    from serendipity_tpu.utils import aot as aot_mod
    from serendipity_tpu.utils.aot import aot_call

    monkeypatch.setenv("SERENDIPITY_TPU_AOT", str(tmp_path))

    def make(version):
        if version == 1:
            def f(x):
                return x * 2
        else:
            def f(x):
                return x * 3
        f.__name__ = "same_name"
        return jax.jit(f)

    x = jnp.ones(4)
    r1 = aot_call(make(1), (x,))
    aot_mod._loaded.clear()
    r2 = aot_call(make(2), (x,))     # same name+shapes, different body
    np.testing.assert_array_equal(np.asarray(r1), 2 * np.ones(4))
    np.testing.assert_array_equal(np.asarray(r2), 3 * np.ones(4))
