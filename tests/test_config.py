"""Tests for the dataset-override dispatch (reference main() mutations)."""

import pytest

from shotvae_tpu.config import ShotVaeConfig, svhn_smooth_defaults


class TestDatasetOverrides:
    def test_cifar10(self):
        cfg = ShotVaeConfig(dataset="Cifar10", annotated_ratio=0.1)
        spec = cfg.apply_dataset_overrides()
        assert cfg.dmi == 2.3              # main_shot_vae.py:139
        assert spec.num_classes == 10
        assert spec.valid_per_class == 500
        assert spec.annotated_per_class == 400  # round(4000 * 0.1)

    def test_cifar100(self):
        cfg = ShotVaeConfig(dataset="Cifar100", annotated_ratio=0.25)
        spec = cfg.apply_dataset_overrides()
        # main_shot_vae.py:161-163
        assert cfg.akb == 150 and cfg.apw == 400 and cfg.dmi == 4.6
        assert spec.num_classes == 100
        assert spec.valid_per_class == 50
        assert spec.annotated_per_class == 100  # round(400 * 0.25)

    def test_svhn(self):
        cfg = ShotVaeConfig(dataset="SVHN")
        spec = cfg.apply_dataset_overrides()
        assert cfg.dmi == 2.3
        assert spec.valid_per_class == 100 and spec.annotated_per_class == 100

    def test_m2_cmi_overrides(self):
        # main_M2_vae.py:123-124,146-147
        cfg = ShotVaeConfig(dataset="Cifar10")
        cfg.apply_dataset_overrides(m2=True)
        assert cfg.cmi == 200
        cfg = ShotVaeConfig(dataset="Cifar100")
        cfg.apply_dataset_overrides(m2=True)
        assert cfg.cmi == 1280 and cfg.dmi == 4.6

    def test_shot_never_touches_cmi(self):
        cfg = ShotVaeConfig(dataset="Cifar10", cmi=0.5)
        cfg.apply_dataset_overrides(m2=False)
        assert cfg.cmi == 0.5

    def test_unknown_dataset_raises(self):
        with pytest.raises(NotImplementedError):
            ShotVaeConfig(dataset="ImageNet").apply_dataset_overrides()

    def test_split_overrides(self):
        cfg = ShotVaeConfig(dataset="Cifar10", valid_per_class=7,
                            annotated_per_class=3)
        spec = cfg.apply_dataset_overrides()
        assert spec.valid_per_class == 7 and spec.annotated_per_class == 3

    def test_svhn_smooth_defaults(self):
        cfg = svhn_smooth_defaults()
        # main_smooth_ELBO_svhn.py:16-30
        assert cfg.latent_spec_cont == 32
        assert cfg.alpha == 1500.0
        assert cfg.labeled_batch_size == 512
        assert cfg.use_plateau_scheduler

    def test_asdict_round_trips_through_checkpoint_config(self):
        cfg = ShotVaeConfig(dataset="Cifar100")
        d = cfg.asdict()
        assert d["dataset"] == "Cifar100"
        cfg2 = ShotVaeConfig(**{k: v for k, v in d.items()
                                if k in ShotVaeConfig.__dataclass_fields__})
        assert cfg2.dataset == "Cifar100"
