#!/usr/bin/env python3
"""Measure the reference implementation's train-step throughput.

The reference publishes no numbers (BASELINE.md), so the baseline is
self-established: instantiate the reference's fusion + classifier stack
(imported from /root/reference, torch CPU — its only real backend here),
run optimizer steps on random feature batches of the cache contract shapes,
and report samples/sec. The result is recorded in BASELINE.md and
hard-coded (with provenance) as `vs_baseline` denominator in bench.py.

Usage: python scripts/measure_reference_baseline.py [batch_size ...]
"""
import sys
import time

REFERENCE = "/root/reference"


def main() -> None:
    sys.path.insert(0, REFERENCE)
    import torch
    import torch.nn.functional as F

    from src.models.fusion.cross_modal_transformer import CrossModalTransformer
    from src.models.fusion.deep_truth_classifier import DeepTruthClassifier

    torch.manual_seed(0)
    batch_sizes = [int(a) for a in sys.argv[1:]] or [16, 128, 512]

    fusion = CrossModalTransformer()
    clf = DeepTruthClassifier()
    params = list(fusion.parameters()) + list(clf.parameters())
    opt = torch.optim.AdamW(params, lr=2e-4, weight_decay=1e-4)

    for B in batch_sizes:
        feats = {
            "text_features": torch.randn(B, 768),
            "audio_features": torch.randn(B, 128),
            "visual_features": torch.randn(B, 512),
            "temporal_features": torch.randn(B, 256),
            "gnn_feat": torch.randn(B, 128),
        }
        aux = torch.rand(B, 2)
        y = torch.randint(0, 2, (B,))

        def step():
            out = fusion(feats)
            co = clf(out["fused"], aux)
            loss = F.cross_entropy(co["logits"], y)
            opt.zero_grad(set_to_none=True)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(params, 5.0)
            opt.step()

        for _ in range(3):  # warmup
            step()
        n_iters = 20
        t0 = time.perf_counter()
        for _ in range(n_iters):
            step()
        dt = (time.perf_counter() - t0) / n_iters
        print(
            f"B={B:4d}  step={dt*1e3:8.2f} ms  throughput={B/dt:10.1f} samples/s"
        )


if __name__ == "__main__":
    main()
