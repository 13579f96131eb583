"""Pure-NumPy golden oracle for the Encode-Process-Decode network.

Independent reimplementation of the documented MeshGraphNets architecture
(arXiv 2010.03409; GraphNetCore API at /root/reference/docs/src/graph_net_core.md)
used to verify the JAX model's per-layer activations allclose (BASELINE.md
north star: activation parity).
"""

import numpy as np


def np_mlp(params, x):
    w, b = params["w"], params["b"]
    h = np.asarray(x, np.float32)
    for i in range(len(w)):
        h = h @ np.asarray(w[i], np.float32) + np.asarray(b[i], np.float32)
        if i < len(w) - 1:
            h = np.maximum(h, 0.0)
    if "ln_scale" in params:
        mean = h.mean(-1, keepdims=True)
        var = ((h - mean) ** 2).mean(-1, keepdims=True)
        h = (h - mean) / np.sqrt(var + 1e-5)
        h = h * np.asarray(params["ln_scale"]) + np.asarray(params["ln_bias"])
    return h


def np_segment_sum(data, seg, n):
    out = np.zeros((n, data.shape[1]), np.float32)
    np.add.at(out, np.asarray(seg), np.asarray(data, np.float32))
    return out


def np_mgn_forward(params, node_features, edge_features, senders, receivers,
                   edge_mask, mps, return_intermediates=False):
    """Forward pass mirroring mgn_tpu.models.mgn.apply_mgn in NumPy."""
    n = node_features.shape[0]
    em = np.asarray(edge_mask, np.float32)[:, None]
    v = np_mlp(params["node_encoder"], node_features)
    e = np_mlp(params["edge_encoder"], edge_features) * em
    inter = {"encoded_nodes": v.copy(), "encoded_edges": e.copy()}
    proc = params["processor"]
    for s in range(mps):
        bp = {
            "edge_mlp": {k: [np.asarray(a)[s] for a in v_] if isinstance(v_, list)
                         else np.asarray(v_)[s]
                         for k, v_ in proc["edge_mlp"].items()},
            "node_mlp": {k: [np.asarray(a)[s] for a in v_] if isinstance(v_, list)
                         else np.asarray(v_)[s]
                         for k, v_ in proc["node_mlp"].items()},
        }
        vs = v[np.asarray(senders)]
        vr = v[np.asarray(receivers)]
        msg = np_mlp(bp["edge_mlp"], np.concatenate([e, vs, vr], -1)) * em
        agg = np_segment_sum(msg, receivers, n)
        upd = np_mlp(bp["node_mlp"], np.concatenate([v, agg], -1))
        v = v + upd
        e = e + msg
        if return_intermediates:
            inter[f"block{s}_nodes"] = v.copy()
    out = np_mlp(params["decoder"], v)
    if return_intermediates:
        return out, inter
    return out
