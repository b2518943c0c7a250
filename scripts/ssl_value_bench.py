"""SSL-value benchmark: does the unlabeled stream actually buy accuracy?

Evidence for the semi-supervised machinery (VERDICT round-1 #3b): at EQUAL
labels, SHOT-VAE (labeled + unlabeled streams, posterior-mixup consistency)
must beat the supervised classifier baseline (labeled stream only,
main_classifier.py behavior). Real CIFAR is absent in this environment, so
the script fabricates a hard synthetic dataset — low-contrast class
patterns under strong per-sample brightness/contrast/pixel nuisance, written
in the standard cifar-10-batches-py pickle format — and runs BOTH trainers
through the production data path unmodified.

Prints one JSON line:
  {"classifier_top1": ..., "shot_vae_top1": ..., "ssl_gain": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_hard_synthetic(n_train=4096, n_test=2048, num_classes=10, seed=0,
                        signal=14.0, brightness=45.0, contrast=0.35,
                        noise=20.0):
    """Class signal small vs nuisance: few labels underdetermine the classes,
    the unlabeled cluster structure disambiguates."""
    rng = np.random.default_rng(seed)
    # smooth class patterns (low spatial frequency, amplitude ~signal)
    freq = rng.normal(size=(num_classes, 4, 4, 3))
    patterns = np.stack([
        np.kron(freq[c], np.ones((8, 8, 1))) for c in range(num_classes)])
    patterns = patterns / np.abs(patterns).max() * signal

    def gen(n, seed2):
        r = np.random.default_rng(seed2)
        labels = r.integers(0, num_classes, n).astype(np.int32)
        x = 128.0 + patterns[labels]
        x = x * (1.0 + r.uniform(-contrast, contrast, (n, 1, 1, 1)))
        x = x + r.uniform(-brightness, brightness, (n, 1, 1, 1))
        x = x + r.normal(0, noise, x.shape)
        return np.clip(x, 0, 255).astype(np.uint8), labels

    return gen(n_train, seed + 1), gen(n_test, seed + 2)


def write_cifar_format(base_path, train, test):
    root = os.path.join(base_path, "dataset", "cifar", "cifar-10-batches-py")
    os.makedirs(root, exist_ok=True)
    (xtr, ytr), (xte, yte) = train, test
    per = len(ytr) // 5
    written = 5 * per  # trailing len%5 samples are dropped by the 5-batch split

    def dump(path, x, y):
        flat = x.transpose(0, 3, 1, 2).reshape(len(y), -1)
        with open(path, "wb") as f:
            pickle.dump({b"data": flat, b"labels": [int(v) for v in y]}, f)

    for i in range(5):
        sl = slice(i * per, (i + 1) * per)
        dump(os.path.join(root, f"data_batch_{i + 1}"), xtr[sl], ytr[sl])
    dump(os.path.join(root, "test_batch"), xte, yte)
    return written


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--labels-per-class", type=int, default=4)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--net-name", default="wideresnet-16-2")
    p.add_argument("--n-train", type=int, default=4096)
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args(argv)

    from shotvae_tpu.config import ClassifierConfig, ShotVaeConfig
    from shotvae_tpu.train.loop import run_classifier, run_shot_vae

    bp = tempfile.mkdtemp(prefix="ssl_value_")
    train, test = make_hard_synthetic(args.n_train)
    n_written = write_cifar_format(bp, train, test)

    common = dict(
        base_path=bp, dataset="Cifar10", net_name=args.net_name,
        batch_size=args.batch_size, epochs=args.epochs, br=True, yes=True,
        seed=args.seed, ckpt_every=0, reconstruct_freq=10_000,
        print_freq=10_000,
        valid_per_class=8, annotated_per_class=args.labels_per_class,
        # ramp every schedule within the short run (defaults assume 600
        # epochs): mi/beta by E/2, elbo weight by E/2, posterior weight by
        # E/4, unsup-cls weight by wmf*E
        akb=args.epochs // 2, aew=args.epochs // 2, apw=args.epochs // 4)

    quiet = lambda *a, **k: None
    cls_res = run_classifier(ClassifierConfig(**common), log_fn=quiet)
    shot_res = run_shot_vae(ShotVaeConfig(**common), log_fn=quiet)

    cls_acc = max(h["test_top1"] for h in cls_res["history"])
    shot_acc = max(h["test_top1"] for h in shot_res["history"])
    print(json.dumps({
        "metric": "ssl_value_synthetic_test_top1",
        "labels": args.labels_per_class * 10,
        "unlabeled": n_written,
        "epochs": args.epochs,
        "classifier_top1": round(cls_acc, 4),
        "shot_vae_top1": round(shot_acc, 4),
        "ssl_gain": round(shot_acc - cls_acc, 4),
    }))
    return 0 if shot_acc > cls_acc else 1


if __name__ == "__main__":
    sys.exit(main())
