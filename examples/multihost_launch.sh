#!/usr/bin/env bash
# Multi-host (pod) launch example: run the SAME command on every host of a
# TPU pod, varying only --process-id. Process 0's host doubles as the
# jax.distributed coordinator.
#
# On GCP TPU pods the typical driver is:
#   gcloud compute tpus tpu-vm ssh $TPU --worker=all -- \
#     GCT2_PROC_ID='$(hostname | grep -o "[0-9]*$")' bash multihost_launch.sh
#
# What the flags do (see docs/USAGE.md "Round-3 additions"):
#  * --coordinator/--num-processes/--process-id initialise jax.distributed
#    BEFORE any backend touch; the mesh then spans every host's chips.
#  * --batch-size is GLOBAL: each host loads batch/N images of its own
#    round-robin file shard; XLA all-reduces gradients over ICI/DCN.
#  * Only process 0 writes checkpoints/TensorBoard/config.json (the dirs
#    below should live on a filesystem every host can read for resume).

COORD=${GCT2_COORD:-10.0.0.2:8476}
NPROC=${GCT2_NPROC:-4}
PROC_ID=${GCT2_PROC_ID:?set GCT2_PROC_ID (0..NPROC-1, one per host)}

exec python -m gan_class_transfer2_tpu.cli train \
    --coordinator "$COORD" --num-processes "$NPROC" --process-id "$PROC_ID" \
    --dataset-pattern '/data/train/*.png' \
    --size 256 --batch-size 1024 --compute-dtype bfloat16 \
    --mesh-data 0 \
    --checkpoint-dir /shared/ckpt --log-dir /shared/logs \
    --ema-decay 0.999 --fid-samples 64
