#!/bin/sh
# Full-scale Amazon2M Cluster-GCN baseline (reference config:
# script/amazon/run_baseline_amazon.sh:6-8 — psize 15000, batch 10,
# h512, 4 layers) at true scale on one chip; reduced epochs.
# Produced results/r2_amazon_cluster_baseline.json (val micro-F1 0.712,
# 15 epochs).  The last epoch always evaluates (--eval-every).
exec python -m gist_tpu.cli.cluster_gcn \
    --dataset synth-amazon2m --psize 15000 --batch-size 10 \
    --n-hidden 512 --n-layers 4 --dropout 0.2 --weight-decay 0 \
    --lr 0.01 --n-epochs "${EPOCHS:-15}" --normalize --use-f1 \
    --use-layernorm-flag --eval-cpu --eval-every "${EPOCHS:-15}" \
    --scan-batches --cache-dir data \
    --result-json results/r2_amazon_cluster_baseline.json
