"""M2-VAE (Kingma) SSL baseline driver.

TPU-native counterpart of /root/reference/main_M2_vae.py (same surface as
the SHOT driver minus mixup; same defaults — epochs 600, milestones
[400,500,550], main_M2_vae.py:42,85).
"""

from shotvae_tpu.cli.common import build_parser, config_from_args, maybe_init_multihost
from shotvae_tpu.train.loop import run_shot_vae


def main(argv=None):
    parser = build_parser(
        "TPU Training M2 Semi-Supervised VAE for Cifar10,Cifar100,SVHN")
    args = parser.parse_args(argv)
    maybe_init_multihost(args)
    cfg = config_from_args(args)
    print(f"Begin the {cfg.train_time} Time's Training M2 VAE, "
          f"Dataset {cfg.dataset}")
    return run_shot_vae(cfg, m2=True, max_epochs=args.max_epochs)


if __name__ == "__main__":
    main()
