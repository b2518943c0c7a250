"""Supervised WRN classifier baseline driver.

TPU-native counterpart of /root/reference/main_classifier.py: trains only on
the labeled SSL split (main_classifier.py:173), shares the SSL flag surface.
"""

from shotvae_tpu.cli.common import build_parser, config_from_args, maybe_init_multihost
from shotvae_tpu.config import ClassifierConfig
from shotvae_tpu.train.loop import run_classifier


def main(argv=None):
    parser = build_parser("TPU Training Supervised Classifier Baseline")
    parser.set_defaults(epochs=500, adjust_lr=[300, 350, 400])  # main_classifier.py:41,63
    args = parser.parse_args(argv)
    maybe_init_multihost(args)
    cfg = config_from_args(args)
    ccfg = ClassifierConfig(**cfg.asdict())
    return run_classifier(ccfg, max_epochs=args.max_epochs)


if __name__ == "__main__":
    main()
