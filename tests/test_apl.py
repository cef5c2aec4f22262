"""APL episodic memory + relational decoder tests (reference apl/,
SURVEY.md §2.5).

Covers: ring-buffer write semantics vs a numpy simulation (incl.
wraparound), kNN retrieval vs numpy argsort (incl. the early-episode
blank-slot mask), a full episode running inside one jitted lax.scan (the
TPU-native design goal), decoder/encoder shapes and gradients, and a tiny
end-to-end episodic-classification training smoke.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from morphganformer_tpu import apl


def test_ring_buffer_matches_numpy_simulation():
    size, dim = 7, 3
    state = apl.init_memory(size, dim, n_classes=5)
    ref_embeds = np.zeros((size, dim), np.float32)
    ref_labels = np.full((size,), 5, np.int64)
    ptr = 0
    rng = np.random.RandomState(0)
    # Batches chosen to hit: plain write, exact-fit write, wraparound write,
    # single-entry write after wrap (reference memory_store.py:38-63 paths).
    for batch in [3, 4, 5, 1, 6]:
        e = rng.randn(batch, dim).astype(np.float32)
        l = rng.randint(0, 5, size=batch)
        state = apl.add_entries(state, jnp.asarray(e), jnp.asarray(l))
        for j in range(batch):
            ref_embeds[ptr] = e[j]
            ref_labels[ptr] = l[j]
            ptr = (ptr + 1) % size
    np.testing.assert_allclose(np.asarray(state.embeds), ref_embeds)
    np.testing.assert_array_equal(np.asarray(state.labels), ref_labels)
    assert int(state.write_pointer) == ptr
    assert int(apl.num_entries(state)) == size


def test_write_larger_than_memory_rejected():
    state = apl.init_memory(4, 2, n_classes=3)
    with pytest.raises(ValueError):
        apl.add_entries(state, jnp.zeros((5, 2)), jnp.zeros((5,), jnp.int32))


def test_knn_matches_numpy():
    rng = np.random.RandomState(1)
    size, dim, k = 16, 4, 5
    embeds = rng.randn(size, dim).astype(np.float32)
    labels = rng.randint(0, 9, size=size)
    state = apl.init_memory(size, dim, n_classes=9)
    state = apl.add_entries(state, jnp.asarray(embeds), jnp.asarray(labels))
    queries = rng.randn(3, dim).astype(np.float32)
    got_e, got_l, got_d = apl.nearest_entries(state, jnp.asarray(queries), k)
    dist = ((queries[:, None, :] - embeds[None, :, :]) ** 2).sum(-1)
    order = np.argsort(dist, axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(got_l), labels[order])
    np.testing.assert_allclose(np.asarray(got_e), embeds[order], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got_d), np.take_along_axis(dist, order, 1),
        rtol=1e-4, atol=1e-4)


def test_knn_early_episode_returns_blank_slots():
    # With fewer than n_neighbours real entries the reference still retrieves
    # n_neighbours slots, the blanks carrying the "unseen" label == n_classes
    # (memory_store.py:76-78 mask_idx = max(n_neighbours, added)).
    state = apl.init_memory(8, 2, n_classes=4)
    state = apl.add_entries(
        state, jnp.ones((2, 2)), jnp.asarray([1, 2], jnp.int32))
    _, labels, dists = apl.nearest_entries(state, jnp.zeros((1, 2)), 4)
    labels = np.asarray(labels[0])
    assert sorted(labels[:2].tolist()) in ([1, 2], [2, 1]) or set(
        labels.tolist()) >= {1, 2}
    assert (labels == 4).sum() == 2           # two blank slots retrieved
    # Blank slots sit at the origin -> distance 0 from a zero query.
    np.testing.assert_allclose(np.sort(np.asarray(dists[0]))[:2], 0.0,
                               atol=1e-6)
    # Slots beyond mask_idx were never eligible: only 4 retrieved out of 8.


def test_episode_runs_inside_one_scan():
    # The TPU-native point of the redesign: write+retrieve every step as a
    # scan carry, one compile, no host round-trips.
    size, dim, k, steps, batch = 12, 3, 4, 6, 2
    decoder_classes = 5

    @jax.jit
    def episode(embeds_seq, labels_seq, queries_seq):
        def step(state, inp):
            e, l, q = inp
            state = apl.add_entries(state, e, l)
            _, nl, nd = apl.nearest_entries(state, q, k)
            return state, (nl, nd)
        state0 = apl.init_memory(size, dim, decoder_classes)
        return jax.lax.scan(step, state0, (embeds_seq, labels_seq, queries_seq))

    rng = jax.random.PRNGKey(0)
    e = jax.random.normal(rng, (steps, batch, dim))
    l = jnp.tile(jnp.asarray([0, 1], jnp.int32), (steps, 1))
    q = jax.random.normal(jax.random.PRNGKey(1), (steps, 1, dim))
    state, (nl, nd) = episode(e, l, q)
    assert int(apl.num_entries(state)) == size
    assert nl.shape == (steps, 1, k) and nd.shape == (steps, 1, k)
    assert bool(jnp.all(jnp.isfinite(nd)))


def _tiny_decoder():
    return apl.RSAFFDecoder(
        n_classes=2, query_embed_dim=8, label_embed_dim=8, n_neighbours=4,
        key_size=4, value_size=4, n_heads=2, num_layers=1)


def test_decoder_shapes_and_grads():
    dec = _tiny_decoder()
    rng = jax.random.PRNGKey(0)
    be = jax.random.normal(rng, (3, 4, 8))
    bl = jnp.zeros((3, 4), jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(1), (3, 8))
    d = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (3, 4)))
    params = dec.init(jax.random.PRNGKey(3), be, bl, q, d)
    logits = dec.apply(params, be, bl, q, d)
    assert logits.shape == (3, 2)

    def loss(p):
        return jnp.mean((dec.apply(p, be, bl, q, d)) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)


def test_decoder_learns_toy_episodic_task():
    # Two well-separated clusters in embedding space; memory holds labeled
    # examples of both. The decoder must learn to read the neighbours'
    # labels — the core APL capability (reference models.py:119-191).
    rng = np.random.RandomState(0)
    dim, k, n_mem = 8, 4, 16
    centers = np.stack([np.full(dim, 2.0), np.full(dim, -2.0)]).astype(np.float32)

    def sample(n):
        y = rng.randint(0, 2, size=n)
        x = centers[y] + 0.3 * rng.randn(n, dim).astype(np.float32)
        return jnp.asarray(x), jnp.asarray(y, jnp.int32)

    mem_x, mem_y = sample(n_mem)
    state = apl.init_memory(n_mem, dim, n_classes=2)
    state = apl.add_entries(state, mem_x, mem_y)

    dec = _tiny_decoder()
    qx, qy = sample(32)
    be, bl, bd = apl.nearest_entries(state, qx, k)
    params = dec.init(jax.random.PRNGKey(0), be, bl, qx, bd)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, qx, qy):
        be, bl, bd = apl.nearest_entries(state, qx, k)

        def loss_fn(p):
            logits = dec.apply(p, be, bl, qx, bd)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, qy).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for i in range(120):
        params, opt_state, loss = step(params, opt_state, qx, qy)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.3 * first, (first, float(loss))
    tx, ty = sample(64)
    be, bl, bd = apl.nearest_entries(state, tx, k)
    acc = float(jnp.mean(
        (jnp.argmax(dec.apply(params, be, bl, tx, bd), -1) == ty)))
    assert acc >= 0.9, acc


def test_encoder_shapes_and_batchnorm_state():
    enc = apl.Encoder()                      # raw flatten: 32->1 spatial, 64 ch
    x = jnp.ones((2, 32, 32, 1))
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    out = enc.apply(variables, x, train=False)
    assert out.shape == (2, 64)
    # Train mode mutates batch stats (reference uses BatchNorm2d,
    # models.py:198).
    out, mutated = enc.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 64) and "batch_stats" in mutated

    enc32 = apl.Encoder(embed_dim=32)
    v32 = enc32.init(jax.random.PRNGKey(0), x, train=False)
    assert enc32.apply(v32, x, train=False).shape == (2, 32)
