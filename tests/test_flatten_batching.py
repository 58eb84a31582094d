"""compiler.flatten_batching: nested vmaps collapse to one flat batch.

The K-face cascade runs its CNNs under nested [batch][face] vmaps;
XLA lowers convs with two batch dims ~3x slower than the same
effective batch flat (tools/tpu_kface_probe.py), so the nets are
wrapped in a custom_vmap rule that reshapes any vmap nesting into the
leading batch dim.  These tests pin (a) numeric parity with the flat
call, (b) that the wrapped fn really IS traced at the flat shape, and
(c) unbatched passthrough.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_face.compiler import flatten_batching


def _make_net(seen):
    """A toy net with build_jax_fn's contract: one [N, ...] input,
    tuple of [N, ...] outputs.  Records trace shapes in ``seen``."""
    w = jnp.arange(8.0).reshape(2, 4) / 7.0

    def net(x):
        seen.append(tuple(x.shape))
        h = jnp.tanh(x.reshape(x.shape[0], -1)[:, :2] @ w)
        return (h, h.sum(axis=-1))

    return net


def test_nested_vmap_flattens_and_matches_flat():
    seen = []
    net = _make_net(seen)
    f = flatten_batching(net)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 5, 4, 4, 2)).astype(np.float32))

    # the cascade's shape: per-face call on [1, ...] under two vmaps
    nested = jax.jit(jax.vmap(jax.vmap(lambda t: f(t[None]))))(x)
    flat_h, flat_s = net(x.reshape(15, 4, 4, 2))

    np.testing.assert_allclose(np.asarray(nested[0]).reshape(15, 4),
                               np.asarray(flat_h), atol=1e-6)
    np.testing.assert_allclose(np.asarray(nested[1]).reshape(15),
                               np.asarray(flat_s), atol=1e-6)
    # outputs keep the nested [B, K, 1, ...] shape the caller expects
    assert np.asarray(nested[0]).shape == (3, 5, 1, 4)
    # the real net must have been traced at the FLAT batch shape
    assert (15, 4, 4, 2) in seen, seen


def test_single_vmap_and_unbatched_passthrough():
    seen = []
    net = _make_net(seen)
    f = flatten_batching(net)

    x = jnp.ones((4, 4, 4, 2))
    direct = f(x)
    ref = net(x)
    np.testing.assert_allclose(np.asarray(direct[0]), np.asarray(ref[0]),
                               atol=1e-6)

    one = jax.jit(jax.vmap(lambda t: f(t[None])))(x)
    assert np.asarray(one[0]).shape == (4, 1, 4)
    np.testing.assert_allclose(np.asarray(one[0])[:, 0], np.asarray(ref[0]),
                               atol=1e-6)
