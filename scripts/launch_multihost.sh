#!/usr/bin/env bash
# Multi-host TPU pod launch: run the same command on every worker.
# sleepgen's trainers call jax.distributed.initialize via
# sleepgen.parallel.initialize_distributed when SLEEPGEN_MULTIHOST=1;
# under TPU pods JAX auto-discovers coordinator/topology.
#
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#     --command="SLEEPGEN_MULTIHOST=1 bash sleepgen/scripts/launch_tpu.sh aekl ..."
set -euo pipefail
echo "Run this script's gcloud template from your controller; see comments."
