"""SHOT-VAE SSL training driver.

TPU-native counterpart of /root/reference/main_shot_vae.py; same flag
surface (see shotvae_tpu.cli.common). Run:
  python -m shotvae_tpu.cli.main_shot_vae --dataset Cifar10 --br -t 1
"""

from shotvae_tpu.cli.common import build_parser, config_from_args, maybe_init_multihost
from shotvae_tpu.train.loop import run_shot_vae


def main(argv=None):
    parser = build_parser(
        "TPU Training Semi-Supervised VAE for Cifar10,Cifar100,SVHN Dataset")
    args = parser.parse_args(argv)
    maybe_init_multihost(args)
    cfg = config_from_args(args)
    print(f"Begin the {cfg.train_time} Time's Training Semi-Supervised VAE, "
          f"Dataset {cfg.dataset}")
    return run_shot_vae(cfg, max_epochs=args.max_epochs)


if __name__ == "__main__":
    main()
