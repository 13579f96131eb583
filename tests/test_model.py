import jax
import jax.numpy as jnp
import numpy as np

from mgn_tpu.core.graph import MeshGraph, build_template
from mgn_tpu.models.mgn import MGNConfig, apply_mgn, init_mgn
from tests.oracle import np_mgn_forward


def make_graph(key, n=32, n_pad=40, e_pad=384, fn=9, fe=3):
    k1, k2, k3 = jax.random.split(key, 3)
    rng = np.random.default_rng(0)
    pos = rng.random((n, 2)).astype(np.float32)
    # random triangles over the nodes
    cells = rng.integers(0, n, size=(40, 3)).astype(np.int32)
    cells = cells[(cells[:, 0] != cells[:, 1]) & (cells[:, 1] != cells[:, 2])
                  & (cells[:, 0] != cells[:, 2])]
    node_type = rng.integers(0, 7, size=(n,)).astype(np.int32)
    t = build_template(pos, node_type, cells=cells, node_bucket=n_pad, edge_bucket=e_pad)
    nf = jax.random.normal(k1, (n_pad, fn), jnp.float32)
    nf = nf * t.node_mask[:, None]
    ef = jax.random.normal(k2, (e_pad, fe), jnp.float32) * t.edge_mask[:, None]
    g = MeshGraph(node_features=nf, edge_features=ef, senders=t.senders,
                  receivers=t.receivers, node_mask=t.node_mask, edge_mask=t.edge_mask)
    return g, t


def test_forward_matches_numpy_oracle():
    cfg = MGNConfig(node_input_dim=9, edge_input_dim=3, output_dim=2,
                    latent_size=32, hidden_layers=2, message_passing_steps=4)
    key = jax.random.PRNGKey(0)
    params = init_mgn(key, cfg)
    g, t = make_graph(jax.random.PRNGKey(1))
    out = apply_mgn(params, g, cfg)

    params_np = jax.tree.map(np.asarray, params)
    ref = np_mgn_forward(
        params_np, np.asarray(g.node_features), np.asarray(g.edge_features),
        np.asarray(g.senders), np.asarray(g.receivers), np.asarray(g.edge_mask),
        mps=4)
    assert out.shape == (40, 2)
    assert np.allclose(np.asarray(out), ref, atol=2e-4), np.abs(np.asarray(out) - ref).max()


def test_forward_jit_and_grad():
    cfg = MGNConfig(node_input_dim=9, edge_input_dim=3, output_dim=2,
                    latent_size=16, hidden_layers=1, message_passing_steps=2)
    params = init_mgn(jax.random.PRNGKey(0), cfg)
    g, t = make_graph(jax.random.PRNGKey(1))

    @jax.jit
    def loss(p):
        out = apply_mgn(p, g, cfg, row_offsets=t.row_offsets)
        return jnp.mean(out**2 * g.node_mask[:, None])

    l1 = loss(params)
    grads = jax.jit(jax.grad(loss))(params)
    gnorm = jax.tree.reduce(lambda a, b: a + b,
                            jax.tree.map(lambda x: jnp.sum(jnp.abs(x)), grads))
    assert jnp.isfinite(l1) and jnp.isfinite(gnorm) and gnorm > 0


def test_padding_invariance():
    """Real-node outputs must be independent of padding capacity."""
    cfg = MGNConfig(node_input_dim=9, edge_input_dim=3, output_dim=2,
                    latent_size=16, hidden_layers=1, message_passing_steps=3)
    params = init_mgn(jax.random.PRNGKey(0), cfg)
    g1, _ = make_graph(jax.random.PRNGKey(1), n_pad=40, e_pad=384)
    g2, _ = make_graph(jax.random.PRNGKey(1), n_pad=48, e_pad=512)
    o1 = apply_mgn(params, g1, cfg)
    o2 = apply_mgn(params, g2, cfg)
    assert np.allclose(np.asarray(o1[:32]), np.asarray(o2[:32]), atol=1e-5)


def test_bf16_compute_close_to_f32():
    cfg32 = MGNConfig(node_input_dim=9, edge_input_dim=3, output_dim=2,
                      latent_size=32, hidden_layers=2, message_passing_steps=2)
    cfg16 = MGNConfig(node_input_dim=9, edge_input_dim=3, output_dim=2,
                      latent_size=32, hidden_layers=2, message_passing_steps=2,
                      compute_dtype=jnp.bfloat16)
    params = init_mgn(jax.random.PRNGKey(0), cfg32)
    g, _ = make_graph(jax.random.PRNGKey(1))
    o32 = np.asarray(apply_mgn(params, g, cfg32))
    o16 = np.asarray(apply_mgn(params, g, cfg16))
    scale = np.abs(o32).max() + 1e-6
    assert np.abs(o16 - o32).max() / scale < 0.15
