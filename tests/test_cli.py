"""CLI driver smoke tests: argparse wiring through to one training epoch."""

import os

import pytest


class TestShotVaeCLI:
    def test_flags_reach_training(self, tmp_path):
        from shotvae_tpu.cli.main_shot_vae import main

        out = main([
            "-bp", str(tmp_path), "--dataset", "Cifar10", "-b", "64",
            "--net-name", "wideresnet-10-1", "--ldc", "8", "--br",
            "--synthetic-data", "--synthetic-size", "512",
            "--valid-per-class", "10", "--annotated-per-class", "10",
            "--yes", "--no-bf16", "--max-epochs", "1",
            "--seed", "3", "-p", "100", "-rf", "100",
            "--annotated-ratio", "0.1",
        ])
        assert len(out["history"]) == 1
        assert 0.0 <= out["history"][0]["valid_top1"] <= 1.0

    def test_quirky_flags_parse(self):
        from shotvae_tpu.cli.common import build_parser, config_from_args

        args = build_parser("t").parse_args([
            "-is", "[32,32]", "-ad", "[400,500,550]", "--dp", "--br", "--om",
            "-ei", "--resume-arg", "-s", "2.0", "-b1", "0.8",
        ])
        cfg = config_from_args(args)
        assert cfg.dp is False          # --dp DISABLES (store_false quirk)
        assert cfg.br and cfg.om and cfg.ei
        assert cfg.x_sigma == 2.0 and cfg.beta1 == 0.8
        assert cfg.adjust_lr == [400, 500, 550]


class TestSmoothCLI:
    def test_mnist_parser_defaults(self):
        from shotvae_tpu.cli.main_smooth_elbo_mnist import build_parser

        a = build_parser(svhn=False).parse_args([])
        assert a.latent_spec == {"cont": 10, "disc": [10]}
        assert a.alpha == 50 and a.labeled_batch_size == 4
        b = build_parser(svhn=True).parse_args([])
        assert b.latent_spec == {"cont": 32, "disc": [10]}
        assert b.alpha == 1500 and b.labeled_batch_size == 512

    def test_latent_spec_flag_parses_dict(self):
        from shotvae_tpu.cli.main_smooth_elbo_mnist import build_parser

        a = build_parser(svhn=False).parse_args(
            ["--latent-spec", "{'cont': 4, 'disc': [10]}"])
        assert a.latent_spec == {"cont": 4, "disc": [10]}


class TestClassifierCLI:
    def test_defaults_match_reference(self):
        from shotvae_tpu.cli.main_classifier import main  # noqa: F401
        from shotvae_tpu.cli.common import build_parser

        p = build_parser("t")
        p.set_defaults(epochs=500, adjust_lr=[300, 350, 400])
        a = p.parse_args([])
        assert a.epochs == 500 and a.adjust_lr == [300, 350, 400]
