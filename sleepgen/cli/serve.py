"""CLI: warm sampling service (sleepgen.serve.SamplerService).

The reference's only "serving" is re-running sample_trials.py per request
(model load + compile every time). This keeps one process-resident,
pre-compiled sampler and answers requests from stdin (one JSON per line:
{"seeds": [0, 1, ...]} or {"start": 0, "stop": 128}, plus optional
"stage" and "guidance_scale" fields for class-conditional checkpoints),
writing .npy artifacts per request — a minimal production loop that works
the same on CPU and TPU. With --oneshot it serves a single request from
flags (--stage/--guidance_scale set the conditional defaults) and exits
(useful for scripted benchmarking of warm throughput).
"""
from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--best_model_path", type=str, required=True,
                   help="AEKL run dir")
    p.add_argument("--diffusion_path", type=str, required=True,
                   help="LDM run dir")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=64)  # v5e optimum (BASELINE.md round-3 sampler tables)
    p.add_argument("--oneshot", action="store_true",
                   help="serve one request from --start/--stop and exit")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--stop", type=int, default=128)
    p.add_argument("--psd", action="store_true")
    p.add_argument("--stage", type=int, default=None,
                   help="default sleep-stage label for class-conditional "
                        "checkpoints (config.unet.num_classes>0); required "
                        "for them unless every request carries a 'stage' "
                        "field. Omit for unconditional checkpoints.")
    p.add_argument("--guidance_scale", type=float, default=1.0,
                   help="default classifier-free guidance scale; requests "
                        "may override via a 'guidance_scale' field (one "
                        "compiled sampler serves all scales)")
    p.add_argument("--pipeline", action="store_true",
                   help="double-buffer requests: dispatch request k+1 to "
                        "the device before finalizing request k's IO, so "
                        "the chip never idles between queued requests. "
                        "Responses for request k are then emitted when "
                        "request k+1 arrives (or at EOF) — use for bulk "
                        "feeds, not strict request/response clients")
    return p


def main(argv=None):
    from sleepgen.utils.profiling import (enable_compilation_cache,
                                          maybe_initialize_multihost)

    maybe_initialize_multihost()
    enable_compilation_cache()
    import json
    import sys
    from pathlib import Path

    import numpy as np

    from sleepgen.serve import SamplerService

    args = build_parser().parse_args(argv)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    svc = SamplerService.from_run_dirs(args.best_model_path,
                                       args.diffusion_path,
                                       batch_size=args.batch_size)
    conditional = svc.cfg.unet.num_classes > 0
    if conditional and args.stage is None:
        print(f"conditional checkpoint (num_classes="
              f"{svc.cfg.unet.num_classes}): requests must carry a 'stage' "
              f"field (no --stage default given)", flush=True)
    compile_s = svc.warmup()
    print(f"ready (compile {compile_s:.1f}s, batch {args.batch_size})",
          flush=True)

    def dispatch(seeds, req_id, stage=None, guidance_scale=None):
        """Start a request on the device; returns (req_id, pending) or None
        after reporting a validation error."""
        stage = args.stage if stage is None else stage
        gs = args.guidance_scale if guidance_scale is None else guidance_scale
        try:  # bad stage/guidance: report, keep serving
            return req_id, svc.sample_async(seeds, stage=stage,
                                            guidance_scale=gs)
        except ValueError as e:
            print(json.dumps({"request": req_id, "error": str(e)}), flush=True)
            return None

    def finalize(req_id, pending):
        sigs = pending.result()
        if args.psd:
            from sleepgen.eval.psd import multitaper_psd_db

            psds, _ = multitaper_psd_db(sigs[..., 0], fmax=18.0)
            np.save(out / f"psds_{req_id}.npy", psds)
        np.save(out / f"signals_{req_id}.npy", sigs)
        print(json.dumps({"request": req_id, "n": len(sigs), **svc.stats}),
              flush=True)

    if args.oneshot:
        job = dispatch(range(args.start, args.stop), 0)
        if job is not None:
            finalize(*job)
        return

    # Streaming loop. Default: strict request/response (finalize before the
    # next read). --pipeline: hold one in-flight request so the device
    # computes request k+1 while the host writes request k's artifacts —
    # closes the request-level vs bulk throughput gap (BASELINE.md serving).
    held = None
    for i, line in enumerate(sys.stdin):
        line = line.strip()
        if not line:
            continue
        # a malformed request must not kill the warm loop — the compiled
        # sampler state it holds is the whole point of the service
        try:
            req = json.loads(line)
            if not isinstance(req, dict):
                raise ValueError(f"request must be a JSON object, got "
                                 f"{type(req).__name__}")
            seeds = (req["seeds"] if "seeds" in req
                     else range(req.get("start", 0), req.get("stop", 128)))
            seeds = list(seeds)
        except (ValueError, TypeError, KeyError) as e:
            print(json.dumps({"request": i, "error": str(e)}), flush=True)
            continue
        job = dispatch(seeds, i, stage=req.get("stage"),
                       guidance_scale=req.get("guidance_scale"))
        if job is None:
            continue
        if not args.pipeline:
            finalize(*job)
        else:
            if held is not None:
                finalize(*held)
            held = job
    if held is not None:
        finalize(*held)


if __name__ == "__main__":
    main()
