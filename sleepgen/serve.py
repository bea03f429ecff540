"""Serving: a warm, pre-compiled sampling service.

The reference's "serving" story is re-running sample_trials.py per batch
of seeds (compile + model load every invocation). For production
deployment sleepgen keeps one process-resident service: models load once,
the DDIM sampler is compiled once per (batch_size) shape, requests batch
seeds and return cropped signals (and optional PSDs). Works the same on
CPU and TPU; pairs with utils/checkpoint + torch_import so either
sleepgen- or reference-trained weights can be served.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sleepgen.config import Config
from sleepgen.sample.sample_ldm import make_ldm_sampler, sampling_schedule
from sleepgen.train.train_aekl import build_models
from sleepgen.train.train_ldm import build_unet


@dataclass
class PendingSample:
    """A dispatched sampling request. The device is already computing when
    this object exists; ``result()`` blocks on the device->host transfer,
    trims chunk padding, and finalizes the service's per-request stats.
    Created by :meth:`SamplerService.sample_async`."""

    _svc: "SamplerService"
    _chunks: list
    _lens: list
    _n: int
    _t0: float

    def result(self) -> np.ndarray:
        if self._chunks is None:  # idempotent: second call returns the cache
            return self._out
        outs = [np.asarray(jax.device_get(c))[:k]
                for c, k in zip(self._chunks, self._lens)]
        self._chunks = None  # free device buffers promptly
        self._out = np.concatenate(outs, axis=0)
        dt = time.perf_counter() - self._t0
        self._svc.stats = {"last_windows": self._n, "last_sec": dt,
                           "last_windows_per_sec": self._n / dt}
        return self._out


@dataclass
class SamplerService:
    """Process-resident LDM sampling service.

    >>> svc = SamplerService.from_run_dirs(aekl_dir, ldm_dir)
    >>> signals = svc.sample(seeds=range(256))        # (256, 3000, 1)
    """

    cfg: Config
    aekl_cfg: Config
    unet_params: dict
    ae_params: dict
    scale_factor: float
    batch_size: int = 64  # v5e optimum (BASELINE.md round-3 sampler tables)
    base_seed: int = 0
    border_pad: int = 36
    # optional jax.sharding.Mesh: seeds shard over the data axis, params
    # replicate — multi-chip serving with per-seed-deterministic output
    # (the data-axis size must divide batch_size)
    mesh: object = None
    _samplers: Dict[int, object] = field(default_factory=dict, repr=False)
    stats: Dict[str, float] = field(default_factory=dict, repr=False)

    # -- constructors --------------------------------------------------------
    @classmethod
    def from_run_dirs(cls, aekl_run_dir: str | Path, ldm_run_dir: str | Path,
                      batch_size: int = 64, **kw) -> "SamplerService":
        from sleepgen.train.train_aekl import restore_aekl_run
        from sleepgen.train.train_ldm import restore_unet_run

        cfg = Config.from_yaml(Path(ldm_run_dir) / "config.yaml")
        aekl_cfg, _, ae_params = restore_aekl_run(aekl_run_dir)
        lc = aekl_cfg.aekl.latent_channels
        _, best = restore_unet_run(cfg, ldm_run_dir, lc, lc,
                                   with_scale_factor=True)
        return cls(cfg=cfg, aekl_cfg=aekl_cfg, unet_params=best["params"],
                   ae_params=ae_params,
                   scale_factor=float(best["scale_factor"]),
                   batch_size=batch_size, **kw)

    # -- internals -----------------------------------------------------------
    def _sampler(self, batch: int, guided: bool = False):
        # guided samplers take guidance_scale as a *traced* scalar, so one
        # compiled graph serves every scale — the cache stays bounded at
        # two entries per batch shape no matter how many scales clients
        # sweep (a baked-in scale would recompile the 200-step scan each
        # time and retain every executable forever)
        key = (batch, guided)
        if key not in self._samplers:
            dtype = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32
            ae, _ = build_models(self.aekl_cfg, dtype)
            lc = self.aekl_cfg.aekl.latent_channels
            unet = build_unet(self.cfg, lc, lc, dtype)
            if self.cfg.fast_sampling_math and dtype == jnp.bfloat16:
                unet = unet.clone(
                    fast_math=True,
                    use_fused_resblock=self.cfg.fused_resblock_sampling)
            elif self.cfg.fused_resblock_sampling:
                unet = unet.clone(use_fused_resblock=True)
            sched = sampling_schedule(self.cfg)
            if self.mesh is not None:
                n_data = self.mesh.shape["data"]
                assert batch % n_data == 0, (batch, n_data)
            self._samplers[key] = make_ldm_sampler(
                unet, ae, sched, self.cfg.unet.image_size, lc,
                self.cfg.diffusion.num_inference_steps,
                border_pad=self.border_pad,
                sampler=self.cfg.diffusion.sampler, mesh=self.mesh,
                conditional=self.cfg.unet.num_classes > 0,
                guided=guided)
        return self._samplers[key]

    def _ensure_device_params(self):
        """Pin the parameter trees on device once. Checkpoint restores hand
        back host numpy arrays; passing those into the jitted sampler would
        re-upload every parameter on every request (measured: ~2.8 s/request
        through the TPU relay at batch 1 vs ~ms once resident). With a mesh,
        params are placed replicated so sharded requests skip the broadcast."""
        if getattr(self, "_params_on_device", False):
            return
        if self.mesh is not None:
            from sleepgen.parallel import replicated

            sh = replicated(self.mesh)
            put = lambda t: jax.device_put(t, sh)  # noqa: E731
        else:
            put = jax.device_put
        self.unet_params = put(self.unet_params)
        self.ae_params = put(self.ae_params)
        self._params_on_device = True

    def warmup(self) -> float:
        """Compile the sampler ahead of traffic; returns compile seconds.
        The warmup call is excluded from ``stats`` so the first real
        request reports steady-state throughput. Conditional checkpoints
        also warm the guided (CFG) graph — its scale is traced, so this
        one call covers every guidance_scale clients may request."""
        t0 = time.perf_counter()
        conditional = self.cfg.unet.num_classes > 0
        stage = 0 if conditional else None
        self.sample(range(self.batch_size), stage=stage)
        if conditional:
            self.sample(range(self.batch_size), stage=stage,
                        guidance_scale=2.0)
        dt = time.perf_counter() - t0
        self.stats = {}
        return dt

    # -- API -----------------------------------------------------------------
    def sample_async(self, seeds: Sequence[int],
                     base_key: Optional[jax.Array] = None,
                     stage: Optional[int] = None,
                     guidance_scale: float = 1.0) -> "PendingSample":
        """Dispatch a request and return immediately (JAX dispatch is
        async): the device starts computing while the host goes back to
        IO/parsing/the next request. ``PendingSample.result()`` blocks on
        the transfer. This is the request-pipelining primitive — a server
        that dispatches request k+1 before finalizing request k keeps the
        chip busy through the host-side gaps that capped request-level
        throughput ~35% below bulk (BASELINE.md round-3 serving table).

        All chunks are dispatched up front (no device_get between chunks),
        so even a single bulk request overlaps result transfer with the
        next chunk's compute. Argument validation still raises HERE, not
        at result(), so callers can reject bad requests synchronously."""
        from sleepgen.sample.samplers import validate_stage

        conditional = self.cfg.unet.num_classes > 0
        validate_stage(self.cfg.unet.num_classes, stage, guidance_scale)
        guided = conditional and guidance_scale != 1.0
        seeds = np.asarray(list(seeds), np.int32)
        key = base_key if base_key is not None else jax.random.PRNGKey(self.base_seed)
        self._ensure_device_params()
        sampler = self._sampler(self.batch_size, guided)
        sf = jnp.float32(self.scale_factor)
        t0 = time.perf_counter()
        chunks, lens = [], []
        for i in range(0, len(seeds), self.batch_size):
            chunk = seeds[i : i + self.batch_size]
            padded = (np.concatenate(
                [chunk, np.full(self.batch_size - len(chunk), chunk[-1], np.int32)])
                if len(chunk) < self.batch_size else chunk)
            args = (self.unet_params, self.ae_params, sf, key,
                    jnp.asarray(padded))
            if conditional:
                args += (jnp.full((self.batch_size,), stage, jnp.int32),)
            if guided:
                args += (jnp.float32(guidance_scale),)
            chunks.append(sampler(*args))
            lens.append(len(chunk))
        return PendingSample(self, chunks, lens, int(len(seeds)), t0)

    def sample(self, seeds: Sequence[int],
               base_key: Optional[jax.Array] = None,
               stage: Optional[int] = None,
               guidance_scale: float = 1.0) -> np.ndarray:
        """Generate windows for the given seeds -> (N, window, 1) float32.
        Per-seed deterministic (same contract as sample_trials).

        ``stage``: class label, required for conditional checkpoints
        (cfg.unet.num_classes>0, range-checked). ``guidance_scale>1`` adds
        classifier-free guidance; the scale is traced, so sweeping scales
        reuses one compiled sampler (two cache entries per batch shape:
        plain and guided)."""
        return self.sample_async(seeds, base_key=base_key, stage=stage,
                                 guidance_scale=guidance_scale).result()

    def sample_with_psd(self, seeds: Sequence[int], stage: Optional[int] = None,
                        guidance_scale: float = 1.0):
        """(signals, psds_db, freqs) — the full sample_trials artifact set
        (DPSS multitaper, the method behind MNE's Epochs ``compute_psd``)."""
        from sleepgen.eval.psd import multitaper_psd_db

        sigs = self.sample(seeds, stage=stage, guidance_scale=guidance_scale)
        psds, freqs = multitaper_psd_db(sigs[..., 0], fmax=18.0)
        return sigs, psds, freqs
