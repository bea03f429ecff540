"""flax -> torch weight exporter (inverse of :mod:`torch_import`).

Closes the interop loop: sleepgen-trained models become torch-style
state_dicts the reference tooling can consume directly —
``compute_mmds.py:470-481`` loads an AEKL ``best_model.pth`` and
``sample_trials.py:113-128`` a UNet one. Name maps are shared with (and
pinned by round-trip tests against) the importers in
:mod:`sleepgen.utils.torch_import`.

Conventions (inverse of torch_import): flax Conv kernel (k, in, out) ->
torch Conv1d weight (out, in, k); Dense kernel (in, out) -> Linear weight
(out, in); GroupNorm scale/bias -> weight/bias.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Sequence

import numpy as np

# canonical home for the AEKL exporter (lives next to its importer)
from sleepgen.utils.torch_import import export_aekl_monai  # noqa: F401


def _conv_w(node) -> np.ndarray:
    return np.ascontiguousarray(
        np.asarray(node["kernel"], np.float32).transpose(2, 1, 0))


def _put_conv(sd: Dict[str, np.ndarray], prefix: str, node) -> None:
    sd[f"{prefix}.weight"] = _conv_w(node)
    if "bias" in node:
        sd[f"{prefix}.bias"] = np.asarray(node["bias"], np.float32)


def _put_dense(sd, prefix, node) -> None:
    sd[f"{prefix}.weight"] = np.ascontiguousarray(
        np.asarray(node["kernel"], np.float32).T)
    sd[f"{prefix}.bias"] = np.asarray(node["bias"], np.float32)


def _put_gn(sd, prefix, node) -> None:
    sd[f"{prefix}.weight"] = np.asarray(node["GroupNorm_0"]["scale"], np.float32)
    sd[f"{prefix}.bias"] = np.asarray(node["GroupNorm_0"]["bias"], np.float32)


def _put_res(sd, p, node) -> None:
    """Inverse of torch_import._res_block (reference unet.py:227-327)."""
    _put_gn(sd, f"{p}.in_layers.0", node["GroupNorm32_0"])
    _put_conv(sd, f"{p}.in_layers.2", node["in_conv"])
    _put_dense(sd, f"{p}.emb_layers.1", node["emb_proj"])
    _put_gn(sd, f"{p}.out_layers.0", node["GroupNorm32_1"])
    _put_conv(sd, f"{p}.out_layers.3", node["out_conv"])
    if "skip_conv" in node:
        _put_conv(sd, f"{p}.skip_connection", node["skip_conv"])


def _put_attn(sd, p, node) -> None:
    """Inverse of torch_import._attn_block (reference unet.py:132-174)."""
    _put_gn(sd, f"{p}.norm", node["GroupNorm32_0"])
    _put_conv(sd, f"{p}.qkv", node["SelfAttention1d_0"]["qkv"])
    _put_conv(sd, f"{p}.proj_out", node["SelfAttention1d_0"]["proj_out"])


def export_unet1d(
    variables: Dict[str, Any],
    channel_mult: Sequence[int] = (1, 2, 4),
    num_res_blocks: int = 2,
    attention_resolutions: Sequence[int] = (8, 4),
) -> Dict[str, np.ndarray]:
    """sleepgen UNet1d params -> reference UNetModel state_dict
    (src/models/unet.py:330-563 module naming; exact inverse of
    torch_import.import_unet1d, pinned by a round-trip test)."""
    p = variables["params"]
    sd: Dict[str, np.ndarray] = {}
    _put_dense(sd, "time_embed.0", p["time_dense_1"])
    _put_dense(sd, "time_embed.2", p["time_dense_2"])
    _put_conv(sd, "input_blocks.0.0", p["conv_in"])
    levels = len(channel_mult)

    blk, ds = 1, 1
    for level in range(levels):
        for i in range(num_res_blocks):
            _put_res(sd, f"input_blocks.{blk}.0", p[f"down_{level}_res_{i}"])
            if ds in attention_resolutions:
                _put_attn(sd, f"input_blocks.{blk}.1", p[f"down_{level}_attn_{i}"])
            blk += 1
        if level != levels - 1:
            _put_res(sd, f"input_blocks.{blk}.0", p[f"down_{level}_downres"])
            blk += 1
            ds *= 2

    _put_res(sd, "middle_block.0", p["mid_res_1"])
    _put_attn(sd, "middle_block.1", p["mid_attn"])
    _put_res(sd, "middle_block.2", p["mid_res_2"])

    blk = 0
    for level in reversed(range(levels)):
        for i in range(num_res_blocks + 1):
            _put_res(sd, f"output_blocks.{blk}.0", p[f"up_{level}_res_{i}"])
            nxt = 1
            if ds in attention_resolutions:
                _put_attn(sd, f"output_blocks.{blk}.{nxt}",
                          p[f"up_{level}_attn_{i}"])
                nxt += 1
            if level > 0 and i == num_res_blocks:
                _put_res(sd, f"output_blocks.{blk}.{nxt}", p[f"up_{level}_upres"])
                ds //= 2
            blk += 1

    _put_gn(sd, "out.0", p["GroupNorm32_0"])
    _put_conv(sd, "out.2", p["conv_out"])
    return sd


def save_state_dict_pth(sd: Dict[str, np.ndarray], path: str | Path) -> Path:
    """Write a numpy state_dict as a ``.pth`` file loadable by the
    reference's ``torch.load`` (compute_mmds.py:470, sample_trials.py:102)."""
    import torch

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)
    return path
