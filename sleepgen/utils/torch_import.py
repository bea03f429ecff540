"""torch -> flax weight importer.

Lets reference-trained checkpoints run in sleepgen (SURVEY.md §5
"checkpoint canonicalization ... a torch->jax weight importer if we want
to validate against reference checkpoints"). Handles the ``module.``
DataParallel prefix drift the reference suffers from
(compute_mmds.py:475-478 vs train_ldm.py:138-141).

Supported architectures:
  * ``import_unet1d`` — the reference's own UNetModel state_dict
    (src/models/unet.py:330-563) -> sleepgen.nn.UNet1d params
  * ``import_aekl_v1`` — src/models/ae_kl.py AutoencoderKL ->
    sleepgen.nn.aekl_v1.AutoencoderKLV1 params

Conventions: torch Conv1d weight (out, in, k) -> flax (k, in, out);
Linear (out, in) -> (in, out); GroupNorm weight/bias -> scale/bias.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import numpy as np


def strip_module_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    if all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      np.float32)


def conv_w(t) -> np.ndarray:
    return _np(t).transpose(2, 1, 0)


def dense_w(t) -> np.ndarray:
    return _np(t).T


def _gn(sd, prefix):
    return {"GroupNorm_0": {"scale": _np(sd[f"{prefix}.weight"]),
                            "bias": _np(sd[f"{prefix}.bias"])}}


def _conv(sd, prefix):
    out = {"kernel": conv_w(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _dense(sd, prefix):
    return {"kernel": dense_w(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


# ---------------------------------------------------------------------------
# UNetModel -> UNet1d
# ---------------------------------------------------------------------------
def _res_block(sd, p):
    """Reference ResBlock (unet.py:227-327) -> TimestepResBlock params."""
    out = {
        "GroupNorm32_0": _gn(sd, f"{p}.in_layers.0"),
        "in_conv": _conv(sd, f"{p}.in_layers.2"),
        "emb_proj": _dense(sd, f"{p}.emb_layers.1"),
        "GroupNorm32_1": _gn(sd, f"{p}.out_layers.0"),
        "out_conv": _conv(sd, f"{p}.out_layers.3"),
    }
    if f"{p}.skip_connection.weight" in sd:
        out["skip_conv"] = _conv(sd, f"{p}.skip_connection")
    return out


def _attn_block(sd, p):
    """Reference AttentionBlock (unet.py:132-174) -> AttentionBlock1d."""
    return {
        "GroupNorm32_0": _gn(sd, f"{p}.norm"),
        "SelfAttention1d_0": {
            "qkv": _conv(sd, f"{p}.qkv"),
            "proj_out": _conv(sd, f"{p}.proj_out"),
        },
    }


def import_unet1d(
    state_dict: Dict[str, Any],
    channel_mult: Sequence[int] = (1, 2, 4),
    num_res_blocks: int = 2,
    attention_resolutions: Sequence[int] = (8, 4),
) -> Dict[str, Any]:
    sd = strip_module_prefix(state_dict)
    params: Dict[str, Any] = {
        "time_dense_1": _dense(sd, "time_embed.0"),
        "time_dense_2": _dense(sd, "time_embed.2"),
        "conv_in": _conv(sd, "input_blocks.0.0"),
    }
    levels = len(channel_mult)

    # input column — torch numbering walks TimestepEmbedSequential blocks
    blk = 1
    ds = 1
    for level in range(levels):
        for i in range(num_res_blocks):
            params[f"down_{level}_res_{i}"] = _res_block(sd, f"input_blocks.{blk}.0")
            if ds in attention_resolutions:
                params[f"down_{level}_attn_{i}"] = _attn_block(
                    sd, f"input_blocks.{blk}.1")
            blk += 1
        if level != levels - 1:
            params[f"down_{level}_downres"] = _res_block(sd, f"input_blocks.{blk}.0")
            blk += 1
            ds *= 2

    params["mid_res_1"] = _res_block(sd, "middle_block.0")
    params["mid_attn"] = _attn_block(sd, "middle_block.1")
    params["mid_res_2"] = _res_block(sd, "middle_block.2")

    # output column
    blk = 0
    for level in reversed(range(levels)):
        for i in range(num_res_blocks + 1):
            params[f"up_{level}_res_{i}"] = _res_block(sd, f"output_blocks.{blk}.0")
            nxt = 1
            if ds in attention_resolutions:
                params[f"up_{level}_attn_{i}"] = _attn_block(
                    sd, f"output_blocks.{blk}.{nxt}")
                nxt += 1
            if level > 0 and i == num_res_blocks:
                params[f"up_{level}_upres"] = _res_block(
                    sd, f"output_blocks.{blk}.{nxt}")
                ds //= 2
            blk += 1

    params["GroupNorm32_0"] = _gn(sd, "out.0")
    params["conv_out"] = _conv(sd, "out.2")
    return {"params": params}


# ---------------------------------------------------------------------------
# ae_kl.AutoencoderKL (v1) -> AutoencoderKLV1
# ---------------------------------------------------------------------------
def _ae_res(sd, p):
    out = {
        "GroupNorm32_0": _gn(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "GroupNorm32_1": _gn(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv(sd, f"{p}.nin_shortcut")
    return out


def _ae_attn(sd, p):
    """ae_kl.AttnBlock (separate q/k/v convs) -> fused qkv (heads=1)."""
    qw, kw, vw = (conv_w(sd[f"{p}.{n}.weight"]) for n in ("q", "k", "v"))
    qb, kb, vb = (_np(sd[f"{p}.{n}.bias"]) for n in ("q", "k", "v"))
    return {
        "GroupNorm32_0": _gn(sd, f"{p}.norm"),
        "SelfAttention1d_0": {
            "qkv": {"kernel": np.concatenate([qw, kw, vw], axis=-1),
                    "bias": np.concatenate([qb, kb, vb])},
            "proj_out": _conv(sd, f"{p}.proj_out"),
        },
    }


def import_aekl_v1(
    state_dict: Dict[str, Any],
    ch_mult: Sequence[int] = (1, 2, 4),
    num_res_blocks: int = 2,
    resolution: int = 3072,
    attn_resolutions: Sequence[int] = (),
) -> Dict[str, Any]:
    sd = strip_module_prefix(state_dict)
    levels = len(ch_mult)

    def column(side: str) -> Dict[str, Any]:
        """Walk the reference's flat blocks ModuleList (ae_kl.py:146-178 /
        211-241) against our named layout."""
        out: Dict[str, Any] = {}
        b = 0
        pre = f"{side}.blocks"
        out["conv_in"] = _conv(sd, f"{pre}.{b}"); b += 1
        if side == "encoder":
            curr_res = resolution
            for i in range(levels):
                for j in range(num_res_blocks):
                    out[f"down_{i}_res_{j}"] = _ae_res(sd, f"{pre}.{b}"); b += 1
                    if curr_res in attn_resolutions:
                        out[f"down_{i}_attn_{j}"] = _ae_attn(sd, f"{pre}.{b}"); b += 1
                if i != levels - 1:
                    out[f"down_{i}_downsample"] = {"conv": _conv(sd, f"{pre}.{b}.conv")}
                    b += 1
                    curr_res //= 2
            out["mid_res_1"] = _ae_res(sd, f"{pre}.{b}"); b += 1
            out["mid_attn"] = _ae_attn(sd, f"{pre}.{b}"); b += 1
            out["mid_res_2"] = _ae_res(sd, f"{pre}.{b}"); b += 1
        else:
            curr_res = resolution // 2 ** (levels - 1)
            out["mid_res_1"] = _ae_res(sd, f"{pre}.{b}"); b += 1
            out["mid_attn"] = _ae_attn(sd, f"{pre}.{b}"); b += 1
            out["mid_res_2"] = _ae_res(sd, f"{pre}.{b}"); b += 1
            for i in reversed(range(levels)):
                for j in range(num_res_blocks):
                    out[f"up_{i}_res_{j}"] = _ae_res(sd, f"{pre}.{b}"); b += 1
                    if curr_res in attn_resolutions:
                        out[f"up_{i}_attn_{j}"] = _ae_attn(sd, f"{pre}.{b}"); b += 1
                if i != 0:
                    out[f"up_{i}_upsample"] = {"conv": _conv(sd, f"{pre}.{b}.conv")}
                    b += 1
                    curr_res *= 2
        out["norm_out"] = _gn(sd, f"{pre}.{b}"); b += 1
        out["conv_out"] = _conv(sd, f"{pre}.{b}")
        return out

    params = {
        "encoder": column("encoder"),
        "decoder": column("decoder"),
        "quant_conv_mu": _conv(sd, "quant_conv_mu"),
        "quant_conv_log_sigma": _conv(sd, "quant_conv_log_sigma"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }
    return {"params": params}


# ---------------------------------------------------------------------------
# braindecode USleep -> sleepgen.nn.USleep (params + batch_stats)
# ---------------------------------------------------------------------------
def _bn_import(sd, prefix):
    params = {"scale": _np(sd[f"{prefix}.weight"]),
              "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def import_usleep(state_dict: Dict[str, Any], depth: int = 12) -> Dict[str, Any]:
    """braindecode/reference USleep state_dict (e.g. the pretrained
    ``/project/params.pt`` used for FID features, compute_fid.py:367-370)
    -> sleepgen USleep variables {'params', 'batch_stats'}."""
    sd = strip_module_prefix(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def add_bn(name, prefix):
        p, s = _bn_import(sd, prefix)
        params[name] = p
        stats[name] = s

    for i in range(depth):
        params[f"enc_{i}_conv"] = _conv(sd, f"encoder.{i}.block_prepool.0")
        add_bn(f"enc_{i}_bn", f"encoder.{i}.block_prepool.2")
    params["bottom_conv"] = _conv(sd, "bottom.0")
    add_bn("bottom_bn", "bottom.2")
    for i in range(depth):
        params[f"dec_{i}_preskip_conv"] = _conv(sd, f"decoder.{i}.block_preskip.1")
        add_bn(f"dec_{i}_preskip_bn", f"decoder.{i}.block_preskip.3")
        params[f"dec_{i}_postskip_conv"] = _conv(sd, f"decoder.{i}.block_postskip.0")
        add_bn(f"dec_{i}_postskip_bn", f"decoder.{i}.block_postskip.2")
    params["clf_conv_1"] = _conv(sd, "clf.0")
    params["clf_conv_2"] = _conv(sd, "clf.3")
    params["clf_conv_3"] = _conv(sd, "clf.5")
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# braindecode SleepStagerChambon2018 -> sleepgen.nn.chambon
# ---------------------------------------------------------------------------
def import_chambon(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference decode checkpoints (outputs/sleep_stage_chambon*/
    final_model.pth) -> SleepStagerChambon2018 variables. Handles the
    2D-conv weight shapes: spatial_conv (V,1,C,1) -> Dense (C,V);
    feature convs (F,1|F,1,k) -> conv1d (k,in,F)."""
    sd = strip_module_prefix(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    fe: Dict[str, Any] = {}

    if "spatial_conv.weight" in sd:
        w = _np(sd["spatial_conv.weight"])  # (V, 1, C, 1)
        fe["spatial"] = {"kernel": w[:, 0, :, 0].T,
                         "bias": _np(sd["spatial_conv.bias"])}

    def conv2d_1k(prefix):
        w = _np(sd[f"{prefix}.weight"])  # (F, in, 1, k)
        return {"kernel": w[:, :, 0, :].transpose(2, 1, 0),
                "bias": _np(sd[f"{prefix}.bias"])}

    fe["conv1"] = conv2d_1k("feature_extractor.0")
    fe["conv2"] = conv2d_1k("feature_extractor.4")
    fe_stats: Dict[str, Any] = {}
    if "feature_extractor.1.running_mean" in sd:
        p1, s1 = _bn_import(sd, "feature_extractor.1")
        p2, s2 = _bn_import(sd, "feature_extractor.5")
        fe["bn1"], fe["bn2"] = p1, p2
        fe_stats = {"bn1": s1, "bn2": s2}

    params["feature_extractor"] = fe
    if fe_stats:
        stats["feature_extractor"] = fe_stats
    # head: 'final_layer.1' (b variant) or 'fc.1'
    for head in ("final_layer.1", "fc.1", "fc"):
        if f"{head}.weight" in sd:
            params["fc"] = _dense(sd, head)
            break
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def import_chambon_sequence(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference variant-a decode checkpoint (TimeDistributed Chambon,
    ``outputs/sleep_stage_chambon/final_model.pth``) ->
    ``TimeDistributedStager`` variables. Torch layout
    (run_sleep_decode.py:174-190): Sequential(TimeDistributed(feats),
    Sequential(Flatten, Dropout, Linear)) — feature keys carry a
    ``0.module.`` prefix and the head lives at ``1.2``."""
    sd = dict(state_dict)
    fe_sd = {k[len("0.module."):]: v for k, v in sd.items()
             if k.startswith("0.module.")}
    base = import_chambon(fe_sd)
    params = {"feature_extractor": base["params"]["feature_extractor"],
              "head": _dense(sd, "1.2")}
    out: Dict[str, Any] = {"params": params}
    if "batch_stats" in base:
        out["batch_stats"] = base["batch_stats"]
    return out


# ---------------------------------------------------------------------------
# MONAI-generative AutoencoderKL (main path) -> sleepgen.nn.AutoencoderKL
# ---------------------------------------------------------------------------
def _monai_conv(sd, prefix):
    """MONAI Convolution(conv_only=True) nests the conv as a child named
    'conv' (monai.networks.blocks.Convolution is an nn.Sequential)."""
    return _conv(sd, f"{prefix}.conv")


class _TrackingDict(dict):
    """dict that records which keys were read — lets importers verify they
    consumed an entire state_dict instead of silently partial-loading."""

    def __init__(self, base):
        super().__init__(base)
        self.consumed: set = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)


def import_aekl_monai(
    state_dict: Dict[str, Any],
    num_channels: Sequence[int] = (32, 32, 64),
    num_res_blocks: int = 2,
    strict: bool = True,
) -> Dict[str, Any]:
    """EXPERIMENTAL: monai-generative 0.2.x ``AutoencoderKL`` state_dict
    (the main-path stage-1 checkpoints, train_autoencoderkl.py:133) ->
    sleepgen AutoencoderKL params, for the reference's flagship config
    (attention_levels all False, no nonlocal attention).

    The name map follows monai-generative's public module layout
    (encoder/decoder ``blocks`` ModuleLists; ResBlock children norm1/conv1/
    norm2/conv2/nin_shortcut; Down/Upsample wrap a Convolution as ``conv``).
    Validated in-tree by a round-trip test (export_aekl_monai ->
    import_aekl_monai is the identity); validation against a real MONAI
    checkpoint requires one, which the reference repo does not ship. As a
    runtime guard against a layout mismatch, ``strict=True`` (default)
    errors on any state_dict key left unconsumed by the name map (missing
    keys already raise KeyError), so a drifted MONAI version fails loudly
    instead of loading partial weights.
    """
    sd = _TrackingDict(strip_module_prefix(state_dict))
    levels = len(num_channels)

    def res(prefix):
        out = {
            "GroupNorm32_0": _gn(sd, f"{prefix}.norm1"),
            "conv1": _monai_conv(sd, f"{prefix}.conv1"),
            "GroupNorm32_1": _gn(sd, f"{prefix}.norm2"),
            "conv2": _monai_conv(sd, f"{prefix}.conv2"),
        }
        if f"{prefix}.nin_shortcut.conv.weight" in sd:
            out["nin_shortcut"] = _monai_conv(sd, f"{prefix}.nin_shortcut")
        return out

    def encoder():
        out: Dict[str, Any] = {}
        b = 0
        pre = "encoder.blocks"
        out["conv_in"] = _monai_conv(sd, f"{pre}.{b}"); b += 1
        for i in range(levels):
            for j in range(num_res_blocks):
                out[f"down_{i}_res_{j}"] = res(f"{pre}.{b}"); b += 1
            if i != levels - 1:
                out[f"down_{i}_downsample"] = {
                    "conv": _monai_conv(sd, f"{pre}.{b}.conv")}
                b += 1
        out["norm_out"] = _gn(sd, f"{pre}.{b}"); b += 1
        out["conv_out"] = _monai_conv(sd, f"{pre}.{b}")
        return out

    def decoder():
        out: Dict[str, Any] = {}
        b = 0
        pre = "decoder.blocks"
        out["conv_in"] = _monai_conv(sd, f"{pre}.{b}"); b += 1
        for i in range(levels):
            for j in range(num_res_blocks):
                out[f"up_{i}_res_{j}"] = res(f"{pre}.{b}"); b += 1
            if i != levels - 1:
                out[f"up_{i}_upsample"] = {
                    "conv": _monai_conv(sd, f"{pre}.{b}.conv")}
                b += 1
        out["norm_out"] = _gn(sd, f"{pre}.{b}"); b += 1
        out["conv_out"] = _monai_conv(sd, f"{pre}.{b}")
        return out

    params = {
        "encoder": encoder(),
        "decoder": decoder(),
        "quant_conv_mu": _monai_conv(sd, "quant_conv_mu"),
        "quant_conv_log_sigma": _monai_conv(sd, "quant_conv_log_sigma"),
        "post_quant_conv": _monai_conv(sd, "post_quant_conv"),
    }
    unconsumed = {k for k in sd if k not in sd.consumed
                  and not k.endswith("num_batches_tracked")}
    if strict and unconsumed:
        raise KeyError(
            "import_aekl_monai: state_dict keys not consumed by the name "
            f"map (layout mismatch?): {sorted(unconsumed)[:10]}"
            f"{' ...' if len(unconsumed) > 10 else ''}")
    return {"params": params}


def export_aekl_monai(variables: Dict[str, Any],
                      num_channels: Sequence[int] = (32, 32, 64),
                      num_res_blocks: int = 2) -> Dict[str, Any]:
    """Inverse of import_aekl_monai: sleepgen AutoencoderKL params -> a
    monai-generative-named torch-style state_dict (numpy tensors). Lets
    reference tooling consume sleepgen-trained stage-1 weights, and pins
    the name map via the round-trip test."""
    p = variables["params"]
    sd: Dict[str, Any] = {}

    def put_conv(prefix, node):
        sd[f"{prefix}.conv.weight"] = np.ascontiguousarray(
            np.asarray(node["kernel"]).transpose(2, 1, 0))
        if "bias" in node:
            sd[f"{prefix}.conv.bias"] = np.asarray(node["bias"])

    def put_gn(prefix, node):
        sd[f"{prefix}.weight"] = np.asarray(node["GroupNorm_0"]["scale"])
        sd[f"{prefix}.bias"] = np.asarray(node["GroupNorm_0"]["bias"])

    def put_res(prefix, node):
        put_gn(f"{prefix}.norm1", node["GroupNorm32_0"])
        put_conv(f"{prefix}.conv1", node["conv1"])
        put_gn(f"{prefix}.norm2", node["GroupNorm32_1"])
        put_conv(f"{prefix}.conv2", node["conv2"])
        if "nin_shortcut" in node:
            put_conv(f"{prefix}.nin_shortcut", node["nin_shortcut"])

    levels = len(num_channels)
    for side, col, tag in (("encoder", p["encoder"], "down"),
                           ("decoder", p["decoder"], "up")):
        b = 0
        pre = f"{side}.blocks"
        put_conv(f"{pre}.{b}", col["conv_in"]); b += 1
        for i in range(levels):
            for j in range(num_res_blocks):
                put_res(f"{pre}.{b}", col[f"{tag}_{i}_res_{j}"]); b += 1
            if i != levels - 1:
                put_conv(f"{pre}.{b}.conv",
                         col[f"{tag}_{i}_{'downsample' if tag == 'down' else 'upsample'}"]["conv"])
                b += 1
        put_gn(f"{pre}.{b}", col["norm_out"]); b += 1
        put_conv(f"{pre}.{b}", col["conv_out"])

    put_conv("quant_conv_mu", p["quant_conv_mu"])
    put_conv("quant_conv_log_sigma", p["quant_conv_log_sigma"])
    put_conv("post_quant_conv", p["post_quant_conv"])
    return sd
