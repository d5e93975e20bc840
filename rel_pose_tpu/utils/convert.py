"""PyTorch <-> JAX checkpoint conversion for ViTEss.

The reference ships pretrained ``.pth`` checkpoints (``{"model": state_dict,
"optimizer": ..., "scheduler": ...}``, saved at
``/root/reference/train.py:189-194``) whose keys may carry a DDP ``module.``
prefix (stripped on load, ``test_matterport.py:109-111``).  This module maps
that state dict onto our (params, state) pytrees and back.

Layout conversions:
  * torch Linear weight (out, in)  ->  ours (in, out)  (transpose)
  * torch Conv2d weight OIHW       ->  ours OIHW       (copy)
  * BatchNorm running_mean/var     ->  state pytree
  * resnet layer3/layer4/fc are dropped: never executed by the reference
    forward (``src/model.py:127-132``) and frozen during training
    (``train.py:59-64``).
"""

import numpy as np
import jax.numpy as jnp

from ..config import ModelConfig


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


# ------------------------------------------------------- key-map builders ----

def _linear(prefix):
    return {"w": (f"{prefix}.weight", "T"), "b": (f"{prefix}.bias", "")}


def _conv(prefix, bias=True):
    m = {"w": (f"{prefix}.weight", "")}
    if bias:
        m["b"] = (f"{prefix}.bias", "")
    return m


def _ln(prefix):
    return {"scale": (f"{prefix}.weight", ""), "bias": (f"{prefix}.bias", "")}


def _bn_params(prefix):
    return {"scale": (f"{prefix}.weight", ""), "bias": (f"{prefix}.bias", "")}


def _bn_state(prefix):
    return {"mean": (f"{prefix}.running_mean", ""),
            "var": (f"{prefix}.running_var", ""),
            "count": (f"{prefix}.num_batches_tracked", "")}


def _basic_block_maps(prefix, downsample):
    p = {
        "conv1": _conv(f"{prefix}.conv1", bias=False),
        "bn1": _bn_params(f"{prefix}.bn1"),
        "conv2": _conv(f"{prefix}.conv2", bias=False),
        "bn2": _bn_params(f"{prefix}.bn2"),
    }
    s = {"bn1": _bn_state(f"{prefix}.bn1"), "bn2": _bn_state(f"{prefix}.bn2")}
    if downsample:
        p["downsample_conv"] = _conv(f"{prefix}.downsample.0", bias=False)
        p["downsample_bn"] = _bn_params(f"{prefix}.downsample.1")
        s["downsample_bn"] = _bn_state(f"{prefix}.downsample.1")
    return p, s


def _vit_block_maps(prefix):
    return {
        "norm1": _ln(f"{prefix}.norm1"),
        "qkv": _linear(f"{prefix}.attn.qkv"),
        "proj": _linear(f"{prefix}.attn.proj"),
        "norm2": _ln(f"{prefix}.norm2"),
        "mlp": {"fc1": _linear(f"{prefix}.mlp.fc1"),
                "fc2": _linear(f"{prefix}.mlp.fc2")},
    }


def _conv_pool_maps(prefix):
    """nn.Sequential(conv, bn, relu, conv, bn) heads (src/model.py:64-81)."""
    p = {
        "conv1": _conv(f"{prefix}.0"),
        "bn1": _bn_params(f"{prefix}.1"),
        "conv2": _conv(f"{prefix}.3"),
        "bn2": _bn_params(f"{prefix}.4"),
    }
    s = {"bn1": _bn_state(f"{prefix}.1"), "bn2": _bn_state(f"{prefix}.4")}
    return p, s


def build_key_maps(cfg: ModelConfig):
    """Returns (params_map, state_map): pytrees whose leaves are
    (torch_key, transform) pairs."""
    pmap, smap = {}, {}

    # resnet trunk
    rp = {"conv1": _conv("resnet.conv1", bias=False),
          "bn1": _bn_params("resnet.bn1")}
    rs = {"bn1": _bn_state("resnet.bn1")}
    for layer, blocks in (("layer1", ("layer1_0", "layer1_1")),
                          ("layer2", ("layer2_0", "layer2_1"))):
        for i, name in enumerate(blocks):
            down = (layer == "layer2" and i == 0)
            rp[name], rs[name] = _basic_block_maps(f"resnet.{layer}.{i}", down)
    pmap["resnet"], smap["resnet"] = rp, rs

    # extractor residual block (norm3 also appears as downsample.1 — same
    # module object in the reference, identical values)
    ep = {
        "conv1": _conv("extractor_final_conv.conv1"),
        "norm1": _bn_params("extractor_final_conv.norm1"),
        "conv2": _conv("extractor_final_conv.conv2"),
        "norm2": _bn_params("extractor_final_conv.norm2"),
        "downsample_conv": _conv("extractor_final_conv.downsample.0"),
        "norm3": _bn_params("extractor_final_conv.norm3"),
    }
    es = {"norm1": _bn_state("extractor_final_conv.norm1"),
          "norm2": _bn_state("extractor_final_conv.norm2"),
          "norm3": _bn_state("extractor_final_conv.norm3")}
    pmap["extractor_final_conv"], smap["extractor_final_conv"] = ep, es

    if cfg.fusion_transformer:
        pmap["pos_embed"] = ("fusion_transformer.pos_embed", "")
        pmap["blocks"] = [
            _vit_block_maps(f"fusion_transformer.blocks.{i}")
            for i in range(cfg.transformer_depth - 1)
        ]
        ci = cfg.transformer_depth - 1
        cross = {
            "norm1": _ln(f"fusion_transformer.blocks.{ci}.norm1"),
            "norm2": _ln(f"fusion_transformer.blocks.{ci}.norm2"),
            "mlp": {"fc1": _linear(f"fusion_transformer.blocks.{ci}.mlp.fc1"),
                    "fc2": _linear(f"fusion_transformer.blocks.{ci}.mlp.fc2")},
        }
        ca = {"qkv": _linear(f"fusion_transformer.blocks.{ci}.cross_attn.qkv")}
        if cfg.noess:
            ca["proj"] = _linear(
                f"fusion_transformer.blocks.{ci}.cross_attn.proj")
        else:
            ca["proj_fundamental"] = _linear(
                f"fusion_transformer.blocks.{ci}.cross_attn.proj_fundamental")
        cross["cross_attn"] = ca
        pmap["cross_block"] = cross
        pmap["norm"] = _ln("fusion_transformer.norm")
    else:
        pp, ps = _conv_pool_maps("pool_transformer_output")
        pmap["pool_transformer_output"] = pp
        smap["pool_transformer_output"] = ps

    if cfg.noess:
        pp, ps = _conv_pool_maps("pool_attn")
        pmap["pool_attn"] = pp
        smap["pool_attn"] = ps

    pmap["pose_regressor"] = {
        "fc1": _linear("pose_regressor.0"),
        "fc2": _linear("pose_regressor.2"),
        "fc3": _linear("pose_regressor.4"),
    }
    return pmap, smap


# ------------------------------------------------------------- converters ----

def _is_leaf_spec(x):
    return isinstance(x, tuple) and len(x) == 2 and isinstance(x[0], str)


def _gather(spec, sd, dtype):
    if _is_leaf_spec(spec):
        key, tf = spec
        if key not in sd:
            raise KeyError(f"checkpoint missing key: {key}")
        arr = _np(sd[key])
        if tf == "T":
            arr = arr.T
        if arr.dtype.kind == "f":
            arr = arr.astype(dtype)
        return jnp.asarray(arr)
    if isinstance(spec, dict):
        return {k: _gather(v, sd, dtype) for k, v in spec.items()}
    if isinstance(spec, list):
        return [_gather(v, sd, dtype) for v in spec]
    raise TypeError(type(spec))


def convert_torch_state_dict(state_dict, cfg: ModelConfig,
                             dtype=np.float32):
    """Torch ``model`` state dict -> (params, state) pytrees.

    Accepts keys with or without the DDP ``module.`` prefix.
    """
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
          for k, v in state_dict.items()}
    pmap, smap = build_key_maps(cfg)
    params = _gather(pmap, sd, dtype)
    state = _gather(smap, sd, dtype)
    # count arrives as a 0-d int64 tensor; normalize dtype
    def fix_counts(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                if "count" in v and not isinstance(v["count"], dict):
                    v["count"] = jnp.asarray(_np(v["count"]),
                                             jnp.int32).reshape(())
                else:
                    fix_counts(v)
    fix_counts(state)
    return params, state


def convert_torchvision_resnet18(state_dict, dtype=np.float32):
    """torchvision ``resnet18`` state_dict -> (trunk_params, trunk_state)
    for the executed trunk (conv1/bn1/layer1/layer2 only).

    Mirrors the reference's ImageNet-pretrained trunk init
    (``models.resnet18(pretrained=True)``, ``src/model.py:31``) without
    needing torchvision in the environment: pass any locally saved
    resnet18 weights file (the torchvision download
    ``resnet18-f37072fd.pth`` or a ``torch.save(model.state_dict())``).
    Unused keys (layer3/layer4/fc — frozen and never executed in the
    reference, ``train.py:59-64``) are ignored.
    """
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
          for k, v in state_dict.items()}
    rp = {"conv1": _conv("conv1", bias=False), "bn1": _bn_params("bn1")}
    rs = {"bn1": _bn_state("bn1")}
    for layer, blocks in (("layer1", ("layer1_0", "layer1_1")),
                          ("layer2", ("layer2_0", "layer2_1"))):
        for i, name in enumerate(blocks):
            down = layer == "layer2" and i == 0
            rp[name], rs[name] = _basic_block_maps(f"{layer}.{i}", down)
    params = _gather(rp, sd, dtype)
    state = _gather(rs, sd, dtype)
    for v in state.values():
        if isinstance(v, dict) and "count" in v:
            v["count"] = jnp.asarray(_np(v["count"]), jnp.int32).reshape(())
    return params, state


def load_torchvision_resnet18(path, dtype=np.float32):
    """Load a torchvision resnet18 weights file from disk (state_dict or
    ``{"model"|"state_dict": ...}`` wrapper) and convert the trunk."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("model", "state_dict"):
        if isinstance(obj, dict) and key in obj and not hasattr(
                obj[key], "shape"):
            obj = obj[key]
    return convert_torchvision_resnet18(obj, dtype)


def _scatter(spec, tree, out):
    if _is_leaf_spec(spec):
        key, tf = spec
        arr = np.asarray(tree)
        if tf == "T":
            arr = arr.T
        out[key] = arr
        return
    if isinstance(spec, dict):
        for k, v in spec.items():
            _scatter(v, tree[k], out)
        return
    if isinstance(spec, list):
        for sv, tv in zip(spec, tree):
            _scatter(sv, tv, out)
        return
    raise TypeError(type(spec))


def export_torch_state_dict(params, state, cfg: ModelConfig):
    """(params, state) -> flat dict of numpy arrays with reference torch
    naming (for interop / round-trip testing)."""
    pmap, smap = build_key_maps(cfg)
    out = {}
    _scatter(pmap, params, out)
    _scatter(smap, state, out)
    return out


def load_torch_checkpoint(path, cfg: ModelConfig):
    """Load a reference ``.pth`` checkpoint file -> (params, state).

    Mirrors the eval CLIs' load (``test_matterport.py:108-111``): takes the
    ``model`` entry and strips ``module.`` prefixes.
    """
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if "model" in ckpt else ckpt
    return convert_torch_state_dict(sd, cfg)


# --------------------------------------------------- optimizer conversion ----

_TORCH_BUFFER_SUFFIXES = (".running_mean", ".running_var",
                          ".num_batches_tracked")


def _strip_module(sd):
    return {k.replace("module.", "", 1) if k.startswith("module.") else k: v
            for k, v in sd.items()}


def _param_names_in_order(model_sd):
    """Ordered *parameter* keys of a reference ViTEss model state dict
    (BN buffers excluded).

    torch's ``state_dict()`` and ``named_parameters()`` both traverse modules
    in registration order (params of a module before its children), so this
    list's index i is exactly torch Adam's param id i — the ordering the
    reference's ``Adam(model.parameters())`` used (``train.py:69``).

    One wrinkle: ``named_parameters()`` deduplicates shared parameters while
    ``state_dict()`` does not.  The only shared module in ViTEss is the
    extractor's norm3, re-registered inside ``downsample``
    (``/root/reference/src/modules/extractor.py:46-48``) — its
    ``downsample.1`` alias keys must be dropped to keep ids aligned.
    """
    alias_prefix = "extractor_final_conv.downsample.1."
    return [k for k in model_sd
            if not k.endswith(_TORCH_BUFFER_SUFFIXES)
            and not k.startswith(alias_prefix)]


def _gather_moments(spec, table, model_sd, dtype):
    """Like ``_gather`` but reads from the Adam moment table, falling back to
    zeros (shaped like the model weight) for params torch never updated."""
    if _is_leaf_spec(spec):
        key, tf = spec
        if key in table:
            arr = _np(table[key])
        else:
            arr = np.zeros_like(_np(model_sd[key]))
        if tf == "T":
            arr = arr.T
        return jnp.asarray(arr.astype(dtype))
    if isinstance(spec, dict):
        return {k: _gather_moments(v, table, model_sd, dtype)
                for k, v in spec.items()}
    if isinstance(spec, list):
        return [_gather_moments(v, table, model_sd, dtype) for v in spec]
    raise TypeError(type(spec))


def convert_torch_adam_state(opt_sd, model_sd, cfg: ModelConfig,
                             dtype=np.float32):
    """torch ``optimizer`` (Adam) state dict -> (mu, nu, count) aligned to
    our params pytree, for warm-starting ``optax.scale_by_adam``.

    The reference's ``--ckpt`` path restores model AND optimizer
    (``/root/reference/train.py:75-86``); torch Adam's per-param
    ``exp_avg``/``exp_avg_sq``/``step`` map 1:1 onto ScaleByAdamState's
    ``mu``/``nu``/``count`` (optax keeps one global count — in a torch run
    every updated param shares the same step, so the max is exact).
    Frozen params (resnet.layer3/4, ``train.py:59-64``) have no torch state
    and are outside our param tree anyway; any mapped param missing from the
    torch state warm-starts at zero moments.
    """
    sd = _strip_module(model_sd)
    names = _param_names_in_order(sd)
    ids = [pid for g in opt_sd["param_groups"] for pid in g["params"]]
    if len(ids) != len(names):
        raise ValueError(
            f"optimizer param_groups reference {len(ids)} params but the "
            f"model state dict has {len(names)} parameters — checkpoint and "
            "model configuration disagree")
    id_to_name = {pid: names[pos] for pos, pid in enumerate(ids)}

    exp_avg, exp_avg_sq, step = {}, {}, 0
    for pid, pstate in opt_sd["state"].items():
        name = id_to_name[int(pid)]
        exp_avg[name] = pstate["exp_avg"]
        exp_avg_sq[name] = pstate["exp_avg_sq"]
        step = max(step, int(_np(pstate["step"]).item()))

    pmap, _ = build_key_maps(cfg)
    mu = _gather_moments(pmap, exp_avg, sd, dtype)
    nu = _gather_moments(pmap, exp_avg_sq, sd, dtype)
    return mu, nu, step


def load_torch_checkpoint_with_optimizer(path, cfg: ModelConfig):
    """Load a reference ``.pth`` -> (params, state, adam) where ``adam`` is
    (mu, nu, count) or None when the checkpoint carries no optimizer."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if "model" in ckpt else ckpt
    params, state = convert_torch_state_dict(sd, cfg)
    adam = None
    if isinstance(ckpt, dict) and "optimizer" in ckpt:
        adam = convert_torch_adam_state(ckpt["optimizer"], sd, cfg)
    return params, state, adam
