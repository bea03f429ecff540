"""One dataclass config tree (SURVEY.md §5: "one dataclass config tree;
eval reads the train config from the run dir instead of re-stating it").

Loads the reference's YAML schema directly (``config/config_aekl_eeg.yaml``,
``config_ldm.yaml``, ``config_dm.yaml``) so published configs work
unchanged, and serializes itself into the run dir as ``config.yaml`` so
samplers/eval never re-hardcode channels (the reference re-states
[32,32,64] in sample_trials.py:97 and compute_mmds.py:467 — designed away).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import List

import yaml


def _coerce(value, typ):
    """YAML 1.1 quirk: '1E4'/'1E-9' (no dot) parse as strings; the
    reference's configs use that form (config_aekl_eeg.yaml:14-17)."""
    if isinstance(value, str):
        try:
            if typ is float:
                return float(value)
            if typ is int:
                return int(value)
        except ValueError:
            return value
    return value


def _replace_known(obj, data: dict):
    known = {f.name: f.type for f in dataclasses.fields(obj)}
    clean = {}
    for k, v in data.items():
        if k not in known:
            continue
        t = known[k]
        t = {"float": float, "int": int, "bool": bool, "str": str}.get(t, t) \
            if isinstance(t, str) else t
        clean[k] = _coerce(v, t)
    return dataclasses.replace(obj, **clean)


@dataclass
class TrainConfig:
    seed: int = 2
    batch_size: int = 16
    n_epochs: int = 100
    val_interval: int = 10  # AEKL name; LDM/DM call it eval_freq
    num_workers: int = 0
    drop_last: bool = False
    base_path: str = "data/sleep-edfx"
    output_dir: str = "outputs"
    run_dir: str = "run"
    experiment: str = "AEKL"
    base_lr: float = 1e-4
    save_every: int = 50
    # class-conditional training only (unet.num_classes>0): probability of
    # replacing a batch label with the CFG null label (-1) so the one
    # network also learns the unconditional score — enables
    # classifier-free guidance at sampling time (guidance_scale>1).
    cond_dropout_prob: float = 0.0


@dataclass
class AEKLModelConfig:
    spatial_dims: int = 1
    in_channels: int = 1
    out_channels: int = 1
    num_channels: List[int] = field(default_factory=lambda: [32, 32, 64])
    latent_channels: int = 1
    num_res_blocks: int = 2
    norm_num_groups: int = 1
    attention_levels: List[bool] = field(default_factory=lambda: [False, False, False])
    with_encoder_nonlocal_attn: bool = False
    with_decoder_nonlocal_attn: bool = False


@dataclass
class DiscriminatorConfig:
    spatial_dims: int = 1
    num_layers_d: int = 3
    num_channels: int = 64
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    norm: str = "BATCH"
    bias: bool = False
    padding: int = 1


@dataclass
class LossConfig:
    optimizer_g_lr: float = 5e-3
    optimizer_d_lr: float = 5e-4
    adv_weight: float = 0.01
    kl_weight: float = 1e-9
    spectral_weight: float = 1e4


@dataclass
class UNetConfig:
    image_size: int = 768
    in_channels: int = 1
    out_channels: int = 1
    model_channels: int = 128
    attention_resolutions: List[int] = field(default_factory=lambda: [8, 4])
    num_res_blocks: int = 2
    channel_mult: List[int] = field(default_factory=lambda: [1, 2, 4])
    dropout: float = 0.0
    conv_resample: bool = True
    num_heads: int = 1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = True
    norm_num_groups: int = 32
    # >0: blockwise (online-softmax) attention when the attention length
    # exceeds this — enables multi-minute windows (beyond-parity)
    kv_block_size: int = 0
    # >0: class-conditional diffusion — a label embedding added to the
    # time embedding (the reference's unet.py:379-380/531-533 carries the
    # field but never trains it; sleepgen wires it end-to-end: labeled
    # batches in train_dm, label-closured samplers, decode-harness gate).
    # 0 (default) is the unconditional reference graph, param tree unchanged.
    num_classes: int = 0


@dataclass
class DiffusionConfig:
    timesteps: int = 1000
    beta_schedule: str = "linear_beta"  # training schedule (train_ldm.py:199)
    linear_start: float = 0.0015
    linear_end: float = 0.0195
    prediction_type: str = "epsilon"
    # DDIM sampling schedule (sample_trials.py:136-145) — intentionally
    # different from training (reference quirk, load-bearing for its FID):
    sample_schedule: str = "scaled_linear_beta"
    sample_beta_start: float = 0.0015
    sample_beta_end: float = 0.0205
    sample_prediction_type: str = "v_prediction"
    num_inference_steps: int = 200
    ema_decay: float = 0.0  # >0 enables EMA of UNet params (beyond-parity)
    sampler: str = "ddim"  # "ddim" (parity) | "dpm++2m" (20-30 steps)


@dataclass
class Config:
    train: TrainConfig = field(default_factory=TrainConfig)
    losses: LossConfig = field(default_factory=LossConfig)
    aekl: AEKLModelConfig = field(default_factory=AEKLModelConfig)
    discriminator: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)
    unet: UNetConfig = field(default_factory=UNetConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    spectral: bool = False  # --spe spectral flag
    dataset: str = "edfx"
    dtype: str = "bfloat16"  # compute dtype on TPU
    use_pallas_norm: bool = False  # fused GroupNorm+SiLU Pallas kernel
    # Sampling-only mixed precision: GroupNorm compute + attention matmuls in
    # bf16 (statistics/softmax/accumulation stay fp32). Training is never
    # affected. Quality-gated by the FID harness; +~45% DDIM throughput on
    # v5e (benches/ablate_unet.py). Set False for strict fp32-norm sampling.
    fast_sampling_math: bool = True
    # Sampling-only fused resblock: run every GroupNorm->SiLU->conv3 chain
    # in the diffusion UNet as ONE Pallas kernel (one HBM read/write per
    # chain instead of XLA's separate norm and conv passes). Identical math
    # class to fast_sampling_math (fp32 stats, bf16 MXU); same param tree,
    # so checkpoints are interchangeable. Default set by the measured
    # verdict in BASELINE.md round-3 (benches/bench_fused_resblock.py +
    # end-to-end sampler A/B).
    fused_resblock_sampling: bool = False
    # Training-step mixed precision for the diffusion UNet (LDM/DM): the
    # same bf16 GN-compute + attention-matmul policy inside the jitted
    # train step (params and Adam state stay fp32 masters; stats/softmax/
    # loss fp32). Measured +17% step throughput on v5e
    # (benches/ablate_train.py: 93.9 -> 110.1 TFLOP/s at batch 256).
    # Quality-gated ON by default: gradient cosine > 0.999 vs strict
    # (tests/test_precision.py) and the DEMO_r3 flagship run trained
    # entirely through this path with val loss within 2.2% of the strict
    # round-2 run and BETTER end metrics (FID 0.0145 vs 0.0161, PSD corr
    # 0.783 vs 0.764, pair-diversity closer to the real floor).
    fast_train_math: bool = True

    # -- I/O ------------------------------------------------------------------
    def to_yaml(self, path: str | Path) -> None:
        Path(path).write_text(yaml.safe_dump(dataclasses.asdict(self)))

    @classmethod
    def from_yaml(cls, path: str | Path) -> "Config":
        raw = yaml.safe_load(Path(path).read_text())
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict) -> "Config":
        if "autoencoderkl" in raw or "model" in raw:
            return cls._from_reference_schema(raw)
        cfg = cls()
        for f in dataclasses.fields(cls):
            if f.name in raw:
                sub = raw[f.name]
                if dataclasses.is_dataclass(f.type) or f.name in (
                    "train", "losses", "aekl", "discriminator", "unet", "diffusion"
                ):
                    setattr(cfg, f.name, _replace_known(getattr(cfg, f.name), sub))
                else:
                    setattr(cfg, f.name, sub)
        return cfg

    @classmethod
    def _from_reference_schema(cls, raw: dict) -> "Config":
        """Read the reference repo's YAML files unchanged."""
        cfg = cls()
        tr = dict(raw.get("train", {}))
        tr.setdefault("val_interval", tr.pop("eval_freq", cfg.train.val_interval))
        cfg.train = _replace_known(cfg.train, tr)
        if "models" in raw:
            cfg.losses = _replace_known(cfg.losses, raw["models"])
        if "autoencoderkl" in raw:
            cfg.aekl = _replace_known(cfg.aekl, raw["autoencoderkl"].get("params", {}))
        if "patchdiscriminator" in raw:
            cfg.discriminator = _replace_known(
                cfg.discriminator, raw["patchdiscriminator"].get("params", {}))
        model = raw.get("model", {}).get("params", {})
        if model:
            cfg.diffusion = dataclasses.replace(
                cfg.diffusion,
                timesteps=model.get("timesteps", 1000),
                # the reference's "linear" (ldm.py make_beta_schedule) is a
                # plain-linspace for MONAI DDPMScheduler at train time
                beta_schedule="linear_beta",
                linear_start=model.get("linear_start", 0.0015),
                linear_end=model.get("linear_end", 0.0195),
                prediction_type="epsilon"
                if model.get("parameterization", "eps") == "eps" else "sample",
            )
            cfg.unet = _replace_known(
                cfg.unet, model.get("unet_config", {}).get("params", {}))
        uroot = raw.get("unet", {}).get("params", {})
        if uroot:
            cfg.unet = _replace_known(cfg.unet, uroot)
        return cfg


def load_config(path: str | Path, **overrides) -> Config:
    cfg = Config.from_yaml(path)
    for k, v in overrides.items():
        if v is None:
            continue
        obj = cfg
        *parents, leaf = k.split(".")
        for p in parents:
            obj = getattr(obj, p)
        setattr(obj, leaf, v)
    return cfg
