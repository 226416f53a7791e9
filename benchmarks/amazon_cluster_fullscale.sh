#!/bin/sh
# Full-scale Amazon2M Cluster-GCN baseline (reference config:
# script/amazon/run_baseline_amazon.sh:6-8 — psize 15000, batch 10,
# h512, 4 layers, 200 epochs there) at true scale on one chip.
# Round 3: >=60 epochs with periodic eval so the F1 curve shows
# convergence, not a single last==best point (VERDICT r2 next #8).
# ~72 s/epoch steady on the chip -> ~80 min at 60 epochs + evals.
exec python -m gist_tpu.cli.cluster_gcn \
    --dataset synth-amazon2m --psize 15000 --batch-size 10 \
    --n-hidden 512 --n-layers 4 --dropout 0.2 --weight-decay 0 \
    --lr 0.01 --n-epochs "${EPOCHS:-60}" --normalize --use-f1 \
    --use-layernorm-flag --eval-cpu --eval-every "${EVAL_EVERY:-5}" \
    --scan-batches --cache-dir data \
    --result-json results/r3_amazon_cluster_baseline.json
