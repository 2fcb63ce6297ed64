"""pack_tree: per-dtype packing round-trip + in-jit unpack equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from smap_tpu.utils.pack import pack_tree


def _tree():
    rng = np.random.RandomState(0)
    return {
        "conv": {"kernel": jnp.asarray(rng.randn(3, 3, 4, 8), jnp.float32),
                 "bias": jnp.asarray(rng.randn(8), jnp.float32)},
        "q": {"w8": jnp.asarray(rng.randint(-128, 127, (16, 16)), jnp.int8),
              "scale": jnp.asarray(rng.rand(16), jnp.float32)},
        "stat": jnp.asarray(rng.rand(), jnp.float32),   # scalar leaf
    }


def test_round_trip_exact():
    tree = _tree()
    packed, unpack = pack_tree(tree)
    # one vector per distinct dtype, dtypes preserved exactly
    assert set(packed) == {"float32", "int8"}
    assert packed["int8"].dtype == jnp.int8
    rebuilt = unpack(packed)
    assert jax.tree.structure(rebuilt) == jax.tree.structure(tree)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(rebuilt)):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unpack_inside_jit_bit_identical():
    tree = _tree()
    packed, unpack = pack_tree(tree)
    # The unpacked leaves, reconstructed INSIDE a jitted program, must be
    # bit-identical to the originals (elementwise consumers then see the
    # exact same values; only reduction re-association could differ, which
    # is a property of the consumer, not of packing).
    rebuilt = jax.jit(lambda p: unpack(p))(packed)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(rebuilt)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # And an elementwise consumer is bit-identical end to end.
    f = lambda t: t["conv"]["kernel"] * 2.0 + t["conv"]["bias"]
    np.testing.assert_array_equal(
        np.asarray(jax.jit(f)(tree)),
        np.asarray(jax.jit(lambda p: f(unpack(p)))(packed)))


def test_traceable_repack_round_trip():
    tree = _tree()
    packed, unpack = pack_tree(tree)
    # unpack.pack is traceable: pack(unpack(p)) inside one jit is identity.
    repacked = jax.jit(lambda p: unpack.pack(unpack(p)))(packed)
    for dt in packed:
        np.testing.assert_array_equal(np.asarray(packed[dt]),
                                      np.asarray(repacked[dt]))


def test_empty_tree():
    packed, unpack = pack_tree({})
    assert packed == {}
    assert unpack(packed) == {}
