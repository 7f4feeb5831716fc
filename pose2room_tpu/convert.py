"""Reference (PyTorch) checkpoint -> flax parameter conversion.

Maps the reference P2RNet state_dict (models/p2rnet/modules/*, key layout
documented per entry below) onto this framework's parameter pytree, enabling
mAP-parity evaluation of reference-trained weights (e.g. the published
``script_level.pth``) on TPU.

Layout conversions:
* Conv1d/Conv2d k=1 (out,in,1[,1]) -> Dense kernel (in,out);
* temporal Conv2d (out,in,3,1)     -> flax Conv kernel (3,1,in,out);
* ``conv_joint`` flattens (C,V) channel-major in torch (stgcn.py:137-138) but
  (V,C) joint-major here — rows are permuted accordingly;
* BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats.

Accepts raw module state_dicts or full checkpoint dicts with ``module.``/
phase prefixes (the reference saves nn.DataParallel-wrapped nets,
net_utils/utils.py:63).

The INVERSE direction (``export_to_reference_state_dict``) maps a flax
pytree back into a reference torch state_dict — see its section below.
"""

import numpy as np


def _dense(w, b=None):
    out = {"kernel": np.asarray(w)[..., 0, 0] if np.asarray(w).ndim == 4 else np.asarray(w)[..., 0]}
    out["kernel"] = out["kernel"].T
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def _bn(sd, prefix):
    params = {"scale": np.asarray(sd[f"{prefix}.weight"]),
              "bias": np.asarray(sd[f"{prefix}.bias"])}
    stats = {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
             "var": np.asarray(sd[f"{prefix}.running_var"])}
    return params, stats


def _mlp(sd, prefix, n_layers, plain_last=True, torch_indices=None):
    """Convert a SingleConv chain to an MLP1x1 subtree."""
    params, stats = {}, {}
    idxs = torch_indices or list(range(n_layers))
    for i, ti in enumerate(idxs):
        w = sd[f"{prefix}.{ti}.conv.weight"]
        b = sd.get(f"{prefix}.{ti}.conv.bias")
        params[f"dense{i}"] = _dense(w, b)
        if f"{prefix}.{ti}.batchnorm.weight" in sd:
            p, s = _bn(sd, f"{prefix}.{ti}.batchnorm")
            params[f"bn{i}"] = p
            stats[f"bn{i}"] = s
    return params, stats


def strip_prefixes(state_dict):
    """Strip DataParallel 'module.' prefixes; return {phase: sub_state_dict}."""
    phases = {"backbone": {}, "centervoting": {}, "detection": {}}
    for k, v in state_dict.items():
        k = k[len("module."):] if k.startswith("module.") else k
        for phase in phases:
            if k.startswith(phase + "."):
                phases[phase][k[len(phase) + 1:]] = v
    return phases


def convert_backbone(sd, num_joints=53, joint_channels=64):
    params, stats = {}, {}
    for name in ("pos_embed", "sk_feat"):
        p, s = _mlp(sd, name, 3)
        params[name] = p
        stats[name] = s
    n_blocks = len({k.split(".")[1] for k in sd if k.startswith("st_gcn_networks.")})
    for i in range(n_blocks):
        pre = f"st_gcn_networks.{i}"
        block = {
            "gcn_dense": _dense(sd[f"{pre}.gcn.conv.weight"], sd[f"{pre}.gcn.conv.bias"]),
        }
        bstats = {}
        p, s = _bn(sd, f"{pre}.tcn.0")
        block["tcn_bn1"] = p
        bstats["tcn_bn1"] = s
        w = np.asarray(sd[f"{pre}.tcn.2.weight"])  # (out,in,3,1)
        block["tcn_conv"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": np.asarray(sd[f"{pre}.tcn.2.bias"]),
        }
        p, s = _bn(sd, f"{pre}.tcn.3")
        block["tcn_bn2"] = p
        bstats["tcn_bn2"] = s
        params[f"gcn{i}"] = block
        stats[f"gcn{i}"] = bstats
        params[f"edge_importance{i}"] = np.asarray(sd[f"edge_importance.{i}"])

    # conv_joint: torch cols are c*V+v, our rows are v*C+c
    w = np.asarray(sd["conv_joint.weight"])[..., 0]  # (256, C*V)
    C, V = joint_channels, num_joints
    perm = np.array([c * V + v for v in range(V) for c in range(C)])
    params["conv_joint"] = {
        "kernel": w[:, perm].T,
        "bias": np.asarray(sd["conv_joint.bias"]),
    }
    return params, stats


def convert_centervoting(sd):
    p, s = _mlp(sd, "conv_input", 3)
    return {"conv_input": p}, {"conv_input": s}


def convert_detection(sd):
    params, stats = {}, {}
    # SA shared MLP: Sequential indices 0, 2 (conv, relu, conv, relu)
    sa = {}
    for i, ti in enumerate((0, 2)):
        sa[f"dense{i}"] = _dense(
            sd[f"vote_aggregation.mlp_module.{ti}.weight"],
            sd[f"vote_aggregation.mlp_module.{ti}.bias"],
        )
    params["sa_mlp"] = sa

    for name, n, plain in (
        ("conv_center", 2, False),
        ("conv_size", 2, False),
        ("conv_heading", 2, False),
        ("conv_sem_obj", 3, True),
    ):
        p, s = _mlp(sd, name, n, plain_last=plain)
        params[name] = p
        stats[name] = s

    for g in ("gmm_center", "gmm_size", "gmm_heading"):
        # single unindexed SingleConv ('cbr') backbone
        bp = {"dense0": _dense(sd[f"{g}.backbone.conv.weight"])}
        p, s = _bn(sd, f"{g}.backbone.batchnorm")
        bp["bn0"] = p
        params[g] = {
            "backbone": bp,
            "pi": _dense(sd[f"{g}.mdn.pi.conv.weight"], sd[f"{g}.mdn.pi.conv.bias"]),
            "mu": np.asarray(sd[f"{g}.mdn.mu"]),
            "log_sigma": np.asarray(sd[f"{g}.mdn.log_sigma"]),
        }
        stats[g] = {"backbone": {"bn0": s}}
    return params, stats


def convert_reference_state_dict(state_dict, num_joints=53):
    """Full conversion: torch state_dict -> {'params': ..., 'batch_stats': ...}.

    Accepts either a flat P2RNet state_dict (optionally 'module.'-prefixed)
    or a dict of per-phase state_dicts.
    """
    if isinstance(state_dict, dict) and set(state_dict.keys()) >= {
        "backbone", "centervoting", "detection",
    } and not any("." in k for k in state_dict.keys()):
        phases = state_dict
    else:
        phases = strip_prefixes(state_dict)

    bp, bs = convert_backbone(phases["backbone"], num_joints=num_joints)
    vp, vs = convert_centervoting(phases["centervoting"])
    dp, ds = convert_detection(phases["detection"])
    params = {"backbone": bp, "centervoting": vp, "detection": dp}
    batch_stats = {"backbone": bs, "centervoting": vs, "detection": ds}
    return {"params": params, "batch_stats": batch_stats}


def load_torch_checkpoint(path):
    """Read a reference .pth checkpoint (CPU) and return the net state_dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("net", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}


# ---------------------------------------------------------------------------
# Inverse direction: flax pytree -> reference torch state_dict.
#
# Enables the trained-weights whole-system A/B (tests/test_system_parity.py):
# a checkpoint TRAINED by this framework is exported into the unmodified
# reference modules (models/p2rnet/modules/*) so both full test pipelines
# can be run on identical weights.  Every mapping is the exact inverse of
# the torch->flax one above (transposes/permutations only, bit-exact), and
# test_torch_parity.py::test_convert_roundtrip locks the round trip.
# ---------------------------------------------------------------------------


def _inv_dense(sub, w_shape):
    """Dense {kernel(in,out)[,bias]} -> torch conv weight of ``w_shape``."""
    w = np.asarray(sub["kernel"]).T.reshape(w_shape)
    out = {"weight": w}
    if "bias" in sub:
        out["bias"] = np.asarray(sub["bias"])
    return out


def _put(flat, template, key, value):
    assert key in template, f"exporter emitted unknown key {key!r}"
    t_shape = tuple(np.shape(template[key]))
    assert tuple(np.shape(value)) == t_shape, (key, np.shape(value), t_shape)
    flat[key] = np.asarray(value)


def _export_dense(flat, tmpl, sub, key):
    for k, v in _inv_dense(sub, np.shape(tmpl[f"{key}.weight"])).items():
        _put(flat, tmpl, f"{key}.{k}", v)


def _export_bn(flat, tmpl, prefix, params, stats):
    _put(flat, tmpl, f"{prefix}.weight", params["scale"])
    _put(flat, tmpl, f"{prefix}.bias", params["bias"])
    _put(flat, tmpl, f"{prefix}.running_mean", stats["mean"])
    _put(flat, tmpl, f"{prefix}.running_var", stats["var"])


def _export_mlp(flat, tmpl, prefix, params, stats, torch_indices=None):
    """Inverse of _mlp: MLP1x1 subtree -> SingleConv chain keys."""
    n = len([k for k in params if k.startswith("dense")])
    idxs = torch_indices or list(range(n))
    for i, ti in enumerate(idxs):
        _export_dense(flat, tmpl, params[f"dense{i}"], f"{prefix}.{ti}.conv")
        if f"bn{i}" in params:
            _export_bn(
                flat, tmpl, f"{prefix}.{ti}.batchnorm",
                params[f"bn{i}"], stats[f"bn{i}"],
            )


def export_to_reference_state_dict(
    payload, template_sd, num_joints=53, joint_channels=64
):
    """flax {'params','batch_stats'} -> torch state_dict (numpy values).

    ``template_sd``: a state_dict from an instantiated reference P2RNet of
    the same configuration (its keys may carry 'module.'/phase prefixes,
    net_utils/utils.py:63).  The export is written INTO a copy of it, so
    non-parameter buffers the pytree does not carry (the graph ``A``,
    BatchNorm ``num_batches_tracked``) keep their template values — they
    are architecture constants / torch bookkeeping, not trained state.
    """
    pref = "module." if any(k.startswith("module.") for k in template_sd) else ""

    def phase_tmpl(phase):
        p = f"{pref}{phase}."
        return {k[len(p):]: v for k, v in template_sd.items() if k.startswith(p)}

    params, stats = payload["params"], payload["batch_stats"]
    flat = {}

    # --- backbone ---
    bt = phase_tmpl("backbone")
    bf = {}
    bp, bs = params["backbone"], stats["backbone"]
    for name in ("pos_embed", "sk_feat"):
        _export_mlp(bf, bt, name, bp[name], bs[name])
    n_blocks = len([k for k in bp if k.startswith("gcn") and k[3:].isdigit()])
    for i in range(n_blocks):
        pre = f"st_gcn_networks.{i}"
        blk, bst = bp[f"gcn{i}"], bs[f"gcn{i}"]
        _export_dense(bf, bt, blk["gcn_dense"], f"{pre}.gcn.conv")
        _export_bn(bf, bt, f"{pre}.tcn.0", blk["tcn_bn1"], bst["tcn_bn1"])
        # temporal conv: flax (3,1,in,out) -> torch (out,in,3,1)
        k = np.asarray(blk["tcn_conv"]["kernel"])
        _put(bf, bt, f"{pre}.tcn.2.weight", np.transpose(k, (3, 2, 0, 1)))
        _put(bf, bt, f"{pre}.tcn.2.bias", blk["tcn_conv"]["bias"])
        _export_bn(bf, bt, f"{pre}.tcn.3", blk["tcn_bn2"], bst["tcn_bn2"])
        _put(bf, bt, f"edge_importance.{i}", bp[f"edge_importance{i}"])
    # conv_joint: our rows are joint-major (v*C+c), torch cols channel-major
    C, V = joint_channels, num_joints
    perm = np.array([c * V + v for v in range(V) for c in range(C)])
    kj = np.asarray(bp["conv_joint"]["kernel"]).T  # (256, C*V) in OUR order
    w = np.empty_like(kj)
    w[:, perm] = kj
    _put(bf, bt, "conv_joint.weight",
         w.reshape(np.shape(bt["conv_joint.weight"])))
    _put(bf, bt, "conv_joint.bias", bp["conv_joint"]["bias"])

    # --- centervoting ---
    vt = phase_tmpl("centervoting")
    vf = {}
    _export_mlp(vf, vt, "conv_input",
                params["centervoting"]["conv_input"],
                stats["centervoting"]["conv_input"])

    # --- detection ---
    dt = phase_tmpl("detection")
    df = {}
    dp, ds = params["detection"], stats["detection"]
    # SA shared MLP is a plain Sequential (pointnet2_modules.py:9-19,
    # bn=False): keys are mlp_module.<i>.{weight,bias}, not SingleConv .conv.*
    for i, ti in enumerate((0, 2)):
        _export_dense(
            df, dt, dp["sa_mlp"][f"dense{i}"],
            f"vote_aggregation.mlp_module.{ti}",
        )
    for name in ("conv_center", "conv_size", "conv_heading", "conv_sem_obj"):
        _export_mlp(df, dt, name, dp[name], ds[name])
    for g in ("gmm_center", "gmm_size", "gmm_heading"):
        _export_dense(df, dt, dp[g]["backbone"]["dense0"], f"{g}.backbone.conv")
        _export_bn(df, dt, f"{g}.backbone.batchnorm",
                   dp[g]["backbone"]["bn0"], ds[g]["backbone"]["bn0"])
        _export_dense(df, dt, dp[g]["pi"], f"{g}.mdn.pi.conv")
        _put(df, dt, f"{g}.mdn.mu", dp[g]["mu"])
        _put(df, dt, f"{g}.mdn.log_sigma", dp[g]["log_sigma"])

    out = dict(template_sd)
    for phase, fl in (("backbone", bf), ("centervoting", vf), ("detection", df)):
        for k, v in fl.items():
            out[f"{pref}{phase}.{k}"] = v
    return out
