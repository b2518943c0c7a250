"""Golden tests for exporting our parameter trees to reference state_dicts.

Two independent directions of evidence:

* round-trip: reference state_dict -> import_torch_state_dict ->
  export_torch_state_dict reproduces every key and value bit-for-bit
  (num_batches_tracked re-emitted as the fresh-module 0);
* torch-load golden: a NATIVELY-initialised model of ours is exported and
  loaded into the actual reference class with ``strict=True``, then both
  forwards are compared — this validates the exporter without leaning on
  the importer.

Skipped when /root/reference is not mounted.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


def _ref(dir_name, mod_name, siblings=()):
    """Import a reference module fresh with ITS directory first on sys.path
    (shot_vae_model and classifier_model both define ``wideresnet``; other
    test files may have left the wrong variant in sys.modules)."""
    import importlib

    sys.path.insert(0, os.path.join(REF, dir_name))
    for m in (mod_name, *siblings):
        sys.modules.pop(m, None)
    return importlib.import_module(mod_name)


_VAE_SIBLINGS = ["wideresnet", "preactresnet", "densenet", "decoder",
                 "mlpvae"]


def _assert_state_dicts_equal(got: dict, want: dict):
    assert set(got) == set(want), (
        f"missing={sorted(set(want) - set(got))[:5]} "
        f"extra={sorted(set(got) - set(want))[:5]}")
    for k, w in want.items():
        w = np.asarray(w.detach().cpu() if hasattr(w, "detach") else w)
        if k.endswith("num_batches_tracked"):
            continue  # dropped on import; re-emitted as fresh-module 0
        np.testing.assert_allclose(np.asarray(got[k]), w.astype(np.float32),
                                   rtol=0, atol=0, err_msg=k)


def _roundtrip(state_dict, kind, **export_kw):
    from shotvae_tpu.io.torch_compat import import_torch_state_dict
    from shotvae_tpu.io.torch_export import export_torch_state_dict

    params, stats = import_torch_state_dict(state_dict, kind)
    return export_torch_state_dict(params, stats, kind, **export_kw)


def _ref_vae(encoder_name):
    ref_vae = _ref("shot_vae_model", "vae", _VAE_SIBLINGS)
    return ref_vae.VariationalAutoEncoder(
        encoder_name=encoder_name, num_input_channels=3, img_size=(32, 32),
        data_parallel=False, continuous_latent_dim=8, disc_latent_dim=10,
        small_input=True)


class TestRoundTrip:
    def test_wideresnet(self, torch):
        ref_mod = _ref("shot_vae_model", "wideresnet")
        ref = ref_mod.WideResNet(num_input_channels=3, depth=10, width=1,
                                 data_parallel=False, small_input=True)
        sd = ref.state_dict()
        _assert_state_dicts_equal(_roundtrip(sd, "wideresnet"), sd)

    @pytest.mark.parametrize("name", ["preactresnet18", "preactresnet50"])
    def test_preactresnet(self, torch, name):
        ref_mod = _ref("shot_vae_model", "preactresnet")
        ref = ref_mod.get_preact_resnet(name, drop_rate=0, input_channels=3,
                                        small_input=True,
                                        data_parallel=False)
        sd = ref.state_dict()
        _assert_state_dicts_equal(_roundtrip(sd, "preactresnet"), sd)

    def test_densenet(self, torch):
        ref_mod = _ref("shot_vae_model", "densenet")
        ref = ref_mod.DenseNet2d(num_input_channels=3, growth_rate=8,
                                 block_config=(2, 2), num_init_features=16,
                                 data_parallel=False, small_input=True)
        sd = ref.state_dict()
        _assert_state_dicts_equal(_roundtrip(sd, "densenet"), sd)

    @pytest.mark.parametrize("encoder_name,encoder_kind", [
        ("wideresnet-10-1", "wideresnet"),
        ("preactresnet18", "preactresnet"),
        ("densenetbc100", "densenet"),
    ])
    def test_vae(self, torch, encoder_name, encoder_kind):
        sd = _ref_vae(encoder_name).state_dict()
        _assert_state_dicts_equal(
            _roundtrip(sd, "vae", encoder_kind=encoder_kind), sd)

    def test_classifier(self, torch):
        ref_mod = _ref("classifier_model", "wideresnet", ["mlp"])
        ref = ref_mod.WideResNet(num_input_channels=3, depth=10, width=1,
                                 num_classes=10, data_parallel=False,
                                 small_input=True)
        sd = ref.state_dict()
        _assert_state_dicts_equal(_roundtrip(sd, "classifier"), sd)

    def test_smooth_vae(self, torch):
        ref_mod = _ref("smooth_vae_model", "mnist_vae")
        from shotvae_tpu.io.torch_compat import import_smooth_vae_state_dict
        from shotvae_tpu.io.torch_export import export_smooth_vae_state_dict

        ref = ref_mod.mnist_VAE(img_size=(1, 32, 32),
                                latent_spec={"cont": 10, "disc": [10]},
                                use_cuda=False)
        sd = ref.state_dict()
        params, _ = import_smooth_vae_state_dict(
            sd, encoder_channels=(32, 64, 64), reshape_channels=64)
        got = export_smooth_vae_state_dict(
            params, encoder_channels=(32, 64, 64), reshape_channels=64)
        _assert_state_dicts_equal(got, sd)

    def test_smooth_vae_svhn(self, torch):
        """The widened svhn_VAE (smooth_vae_model/svhn_vae.py:22-23: 512
        hidden, (128,4,4) reshape) exercises reshape-seam permutations at
        dims the mnist defaults would get wrong."""
        ref_mod = _ref("smooth_vae_model", "svhn_vae")
        from shotvae_tpu.io.torch_compat import import_smooth_vae_state_dict
        from shotvae_tpu.io.torch_export import export_smooth_vae_state_dict

        ref = ref_mod.svhn_VAE(img_size=(3, 32, 32),
                               latent_spec={"cont": 32, "disc": [10]},
                               use_cuda=False)
        sd = ref.state_dict()
        params, _ = import_smooth_vae_state_dict(
            sd, encoder_channels=(32, 64, 128), reshape_channels=128)
        got = export_smooth_vae_state_dict(
            params, encoder_channels=(32, 64, 128), reshape_channels=128)
        _assert_state_dicts_equal(got, sd)
        # the checkpoint-export script sniffs these dims from the Dense
        # kernels flanking the 4x4 reshapes — pin the recovery arithmetic
        assert int(np.shape(params["features_to_hidden"]["kernel"])[0]
                   ) // 16 == 128
        assert int(np.shape(params["hidden_to_features"]["kernel"])[1]
                   ) // 16 == 128

    def test_mlp(self, torch):
        ref_mod = _ref("classifier_model", "mlp")
        from shotvae_tpu.io.torch_compat import import_mlp_state_dict
        from shotvae_tpu.io.torch_export import (export_mlp_state_dict,
                                                 insert_module_wrappers)

        # the reference MLP wraps submodules in DataParallel unconditionally
        # (mlp.py:26,32), so its keys always carry .module
        ref = ref_mod.MLP(num_input_channels=1, num_classes=10)
        sd = ref.state_dict()
        params, _ = import_mlp_state_dict(sd)
        wrapped = insert_module_wrappers(export_mlp_state_dict(params),
                                         sd.keys())
        _assert_state_dicts_equal(wrapped, sd)


def _load_into(torch, ref, exported):
    ref.load_state_dict(
        {k: torch.as_tensor(np.array(v)) for k, v in exported.items()},
        strict=True)
    ref.eval()


class TestTorchLoadGolden:
    """Export a natively-initialised model of ours; torch must accept it
    with strict=True and reproduce our forward."""

    def test_wideresnet_forward(self, torch):
        ref_mod = _ref("shot_vae_model", "wideresnet")
        from shotvae_tpu.io.torch_export import export_torch_state_dict
        from shotvae_tpu.models import WideResNet
        from shotvae_tpu.train.state import init_model

        model = WideResNet(depth=10, width=1)
        params, stats = init_model(model, jax.random.key(7),
                                   jnp.zeros((1, 32, 32, 3)))
        exported = export_torch_state_dict(params, stats, "wideresnet")
        ref = ref_mod.WideResNet(num_input_channels=3, depth=10, width=1,
                                 data_parallel=False, small_input=True)
        _load_into(torch, ref, exported)

        x = np.random.default_rng(11).normal(size=(2, 32, 32, 3)).astype(
            np.float32)
        with torch.no_grad():
            want = ref(torch.tensor(x).permute(0, 3, 1, 2))
        got = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(got),
                                   want.permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-3, atol=1e-3)

    def test_classifier_forward(self, torch):
        ref_mod = _ref("classifier_model", "wideresnet", ["mlp"])
        from shotvae_tpu.io.torch_export import export_torch_state_dict
        from shotvae_tpu.models import WideResNetClassifier
        from shotvae_tpu.train.state import init_model

        model = WideResNetClassifier(depth=10, width=1, num_classes=10)
        params, stats = init_model(model, jax.random.key(8),
                                   jnp.zeros((1, 32, 32, 3)))
        exported = export_torch_state_dict(params, stats, "classifier")
        ref = ref_mod.WideResNet(num_input_channels=3, depth=10, width=1,
                                 num_classes=10, data_parallel=False,
                                 small_input=True)
        _load_into(torch, ref, exported)

        x = np.random.default_rng(12).normal(size=(2, 32, 32, 3)).astype(
            np.float32)
        with torch.no_grad():
            want = ref(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
        got = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3,
                                   atol=1e-3)

    def test_vae_heads_and_decoder_forward(self, torch):
        from shotvae_tpu.io.torch_export import export_torch_state_dict
        from shotvae_tpu.models import VariationalAutoEncoder
        from shotvae_tpu.train.state import init_model

        model = VariationalAutoEncoder(encoder_name="wideresnet-10-1",
                                       continuous_latent_dim=8,
                                       disc_latent_dim=10)
        params, stats = init_model(model, jax.random.key(9),
                                   jnp.zeros((1, 32, 32, 3)))
        exported = export_torch_state_dict(params, stats, "vae")
        ref = _ref_vae("wideresnet-10-1")
        _load_into(torch, ref, exported)
        variables = {"params": params, "batch_stats": stats}

        rng = np.random.default_rng(13)
        x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
        tx = torch.tensor(x).permute(0, 3, 1, 2)
        with torch.no_grad():
            feats = ref.feature_extractor(tx)
            avg = ref.global_avg(feats).view(2, -1)
            want_mean = ref.continuous_inference.mean(avg).numpy()
            want_la = ref.disc_latent_inference(avg).numpy()
        got_mean, _, got_la = model.apply(variables, jnp.asarray(x),
                                          train=False, method="encode")
        np.testing.assert_allclose(np.asarray(got_mean), want_mean,
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(got_la), want_la,
                                   rtol=1e-3, atol=2e-3)

        z = rng.normal(size=(2, 18)).astype(np.float32)
        with torch.no_grad():
            want_rec = ref.feature_reconstructor(
                torch.tensor(z).view(2, 18, 1, 1))
        got_rec = model.apply(variables, jnp.asarray(z), train=False,
                              method="decode")
        np.testing.assert_allclose(np.asarray(got_rec),
                                   want_rec.permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-3, atol=1e-3)

    def test_smooth_vae_forward(self, torch):
        ref_mod = _ref("smooth_vae_model", "mnist_vae")
        from shotvae_tpu.io.torch_export import export_smooth_vae_state_dict
        from shotvae_tpu.models import SmoothVAE, mnist_vae_config
        from shotvae_tpu.train.state import init_model

        model = SmoothVAE(**mnist_vae_config())
        params, stats = init_model(model, jax.random.key(10),
                                   jnp.zeros((1, 32, 32, 1)))
        exported = export_smooth_vae_state_dict(
            params, encoder_channels=(32, 64, 64), reshape_channels=64)
        ref = ref_mod.mnist_VAE(img_size=(1, 32, 32),
                                latent_spec={"cont": 10, "disc": [10]},
                                use_cuda=False)
        _load_into(torch, ref, exported)

        x_chw = np.random.default_rng(14).normal(
            size=(2, 1, 32, 32)).astype(np.float32)
        with torch.no_grad():
            t_recon, t_dist, t_latent, _ = ref(torch.tensor(x_chw))
        recon, dist, latent, _ = model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x_chw.transpose(0, 2, 3, 1)), train=False)
        np.testing.assert_allclose(np.asarray(dist["cont"][0]),
                                   t_dist["cont"][0].numpy(), rtol=1e-3,
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(latent), t_latent.numpy(),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(recon),
                                   t_recon.permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-3, atol=1e-3)


class TestDataParallelWrappers:
    def test_wrapped_keys_strict_load(self, torch):
        ref_mod = _ref("shot_vae_model", "wideresnet")
        from shotvae_tpu.io.torch_export import (export_torch_state_dict,
                                                 insert_module_wrappers)
        from shotvae_tpu.models import WideResNet
        from shotvae_tpu.train.state import init_model

        model = WideResNet(depth=10, width=1)
        params, stats = init_model(model, jax.random.key(15),
                                   jnp.zeros((1, 32, 32, 3)))
        exported = export_torch_state_dict(params, stats, "wideresnet")
        ref_dp = ref_mod.WideResNet(num_input_channels=3, depth=10, width=1,
                                    data_parallel=True, small_input=True)
        wrapped = insert_module_wrappers(exported,
                                         ref_dp.state_dict().keys())
        assert any(".module." in k for k in wrapped)
        ref_dp.load_state_dict(
            {k: torch.as_tensor(np.array(v)) for k, v in wrapped.items()},
            strict=True)


class TestExportCheckpointScript:
    def test_orbax_to_pth_roundtrip(self, torch, tmp_path):
        """scripts/export_torch_checkpoint.py: orbax checkpoint ->
        reference-format .pth.tar that strict-loads into the torch class."""
        from shotvae_tpu.io.checkpoint import CheckpointManager
        from shotvae_tpu.models import WideResNet
        from shotvae_tpu.train.state import TrainState, init_model, sgd_torch

        model = WideResNet(depth=10, width=1)
        params, stats = init_model(model, jax.random.key(20),
                                   jnp.zeros((1, 32, 32, 3)))
        state = TrainState.create(apply_fn=model.apply, params=params,
                                  batch_stats=stats, tx=sgd_torch(0.1))
        cm = CheckpointManager(str(tmp_path), "Cifar10", 1)
        cm.save(state, epoch=3, config={"net_name": "wideresnet-10-1"})
        cm.wait_until_finished()  # the export script reads the files directly

        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "export_torch_checkpoint",
            os.path.join(os.path.dirname(__file__), "..", "scripts",
                         "export_torch_checkpoint.py"))
        script = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(script)
        out = str(tmp_path / "model.pth.tar")
        rc = script.main(["--ckpt", os.path.join(cm.folder, "checkpoint"),
                          "--out", out])
        assert rc == 0

        payload = torch.load(out)
        assert payload["epoch"] == 3
        assert payload["args"]["net_name"] == "wideresnet-10-1"
        ref_mod = _ref("shot_vae_model", "wideresnet")
        ref = ref_mod.WideResNet(num_input_channels=3, depth=10, width=1,
                                 data_parallel=False, small_input=True)
        ref.load_state_dict(payload["state_dict"], strict=True)

        # the run FOLDER also resolves (checkpoint.current pointer inside)
        out2 = str(tmp_path / "model2.pth.tar")
        assert script.main(["--ckpt", cm.folder, "--out", out2]) == 0
        p2 = torch.load(out2)["state_dict"]
        for k, v in payload["state_dict"].items():
            np.testing.assert_array_equal(np.asarray(v), np.asarray(p2[k]))

    def test_script_guards(self, tmp_path):
        """Auto-sniff refuses WRN/preact-ambiguous trees with no usable
        net_name; a payload without a params tree errors instead of
        writing an empty .pth.tar."""
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "export_torch_checkpoint_g",
            os.path.join(os.path.dirname(__file__), "..", "scripts",
                         "export_torch_checkpoint.py"))
        script = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(script)

        ambiguous = {"pre_process": {}, "block1_unit1": {}}
        with pytest.raises(SystemExit, match="cannot sniff"):
            script._sniff_kind(ambiguous, "")
        # a usable net_name disambiguates
        assert script._sniff_kind(ambiguous, "preactresnet18")[0] == \
            "preactresnet"
        assert script._sniff_kind(ambiguous, "wideresnet-28-2")[0] == \
            "wideresnet"

        import orbax.checkpoint as ocp

        raw = tmp_path / "raw_tree"
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(str(raw), {"weights": np.zeros((2, 2), np.float32)})
        ckptr.wait_until_finished()
        with pytest.raises(SystemExit, match="no 'params' tree"):
            script.main(["--ckpt", str(raw),
                         "--out", str(tmp_path / "never.pth.tar")])
        assert not (tmp_path / "never.pth.tar").exists()


class TestVaeAltEncoderImport:
    """The importer's trunk dispatch: a preactresnet encoder inside the
    VAE (shot_vae_model/vae.py:102-104) imports and reproduces the torch
    encoder+heads forward."""

    def test_vae_preact_forward_matches(self, torch):
        from shotvae_tpu.io.torch_compat import (import_torch_state_dict,
                                                 merge_imported)
        from shotvae_tpu.models import VariationalAutoEncoder
        from shotvae_tpu.train.state import init_model

        torch.manual_seed(0)
        ref = _ref_vae("preactresnet18")
        ref.eval()

        model = VariationalAutoEncoder(encoder_name="preactresnet18",
                                       continuous_latent_dim=8,
                                       disc_latent_dim=10)
        params, stats = init_model(model, jax.random.key(16),
                                   jnp.zeros((1, 32, 32, 3)))
        ip, istats = import_torch_state_dict(ref.state_dict(), "vae")
        params, stats = merge_imported(params, stats, ip, istats)

        x = np.random.default_rng(17).normal(size=(2, 32, 32, 3)).astype(
            np.float32)
        tx = torch.tensor(x).permute(0, 3, 1, 2)
        with torch.no_grad():
            feats = ref.feature_extractor(tx)
            avg = ref.global_avg(feats).view(2, -1)
            want_mean = ref.continuous_inference.mean(avg).numpy()
            want_la = ref.disc_latent_inference(avg).numpy()
        got_mean, _, got_la = model.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x),
            train=False, method="encode")
        np.testing.assert_allclose(np.asarray(got_mean), want_mean,
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(got_la), want_la,
                                   rtol=1e-3, atol=2e-3)
