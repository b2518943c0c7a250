"""One-stage smooth-ELBO SVHN(1k labels) driver.

TPU-native counterpart of /root/reference/main_smooth_ELBO_svhn.py:14-36
(same flags/defaults, incl. the ReduceLROnPlateau scheduler).
"""

from shotvae_tpu.cli.main_smooth_elbo_mnist import run


def main(argv=None):
    return run(svhn=True, argv=argv)


if __name__ == "__main__":
    main()
