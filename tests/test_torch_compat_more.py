"""Cross-framework golden tests for the remaining zoo: PreActResNet,
DenseNet, and the smooth VAEs (deterministic eval forward)."""

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
def torch_ref():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.join(REF, "shot_vae_model"))
    sys.path.insert(0, os.path.join(REF, "smooth_vae_model"))
    return torch


class TestPreActResNetImport:
    @pytest.mark.parametrize("name", ["preactresnet18", "preactresnet50"])
    def test_forward_matches(self, torch_ref, name):
        torch = torch_ref
        import preactresnet as ref_mod

        torch.manual_seed(0)
        ref = ref_mod.get_preact_resnet(name, drop_rate=0, input_channels=3,
                                        small_input=True, data_parallel=False)
        ref.eval()

        from shotvae_tpu.io.torch_compat import import_torch_state_dict, merge_imported
        from shotvae_tpu.models import PreActResNet, preactresnet_dict
        from shotvae_tpu.train.state import init_model

        cfg = preactresnet_dict[name]
        model = PreActResNet(expansion=cfg["expansion"],
                             block_config=cfg["block_config"])
        params, stats = init_model(model, jax.random.key(0),
                                   jnp.zeros((1, 32, 32, 3)))
        ip, istats = import_torch_state_dict(ref.state_dict(), "preactresnet")
        params, stats = merge_imported(params, stats, ip, istats)

        x = np.random.default_rng(1).normal(size=(2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.tensor(x).permute(0, 3, 1, 2))
        want = want.permute(0, 2, 3, 1).numpy()
        got = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)


class TestDenseNetImport:
    def test_forward_matches(self, torch_ref):
        torch = torch_ref
        import densenet as ref_mod

        torch.manual_seed(0)
        # tiny custom config to keep CPU time low
        ref = ref_mod.DenseNet2d(num_input_channels=3, growth_rate=8,
                                 block_config=(2, 2), num_init_features=16,
                                 data_parallel=False, small_input=True)
        ref.eval()

        from shotvae_tpu.io.torch_compat import import_torch_state_dict, merge_imported
        from shotvae_tpu.models import DenseNet
        from shotvae_tpu.train.state import init_model

        model = DenseNet(growth_rate=8, block_config=(2, 2),
                         num_init_features=16)
        params, stats = init_model(model, jax.random.key(0),
                                   jnp.zeros((1, 32, 32, 3)))
        ip, istats = import_torch_state_dict(ref.state_dict(), "densenet")
        params, stats = merge_imported(params, stats, ip, istats)

        x = np.random.default_rng(2).normal(size=(2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.tensor(x).permute(0, 3, 1, 2))
        want = want.permute(0, 2, 3, 1).numpy()
        got = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)


class TestSmoothVaeImport:
    def test_mnist_eval_forward_matches(self, torch_ref):
        torch = torch_ref
        import mnist_vae as ref_mod

        torch.manual_seed(0)
        ref = ref_mod.mnist_VAE(img_size=(1, 32, 32),
                                latent_spec={"cont": 10, "disc": [10]},
                                use_cuda=False)
        ref.eval()  # deterministic: z = mean, y = argmax one-hot

        from shotvae_tpu.io.torch_compat import import_smooth_vae_state_dict
        from shotvae_tpu.models import SmoothVAE, mnist_vae_config
        from shotvae_tpu.train.state import init_model
        from shotvae_tpu.io.torch_compat import merge_imported

        model = SmoothVAE(**mnist_vae_config())
        params, stats = init_model(model, jax.random.key(0),
                                   jnp.zeros((1, 32, 32, 1)))
        ip, _ = import_smooth_vae_state_dict(
            ref.state_dict(), encoder_channels=(32, 64, 64),
            reshape_channels=64)
        params, stats = merge_imported(params, stats, ip, {})

        # build NCHW natively: a permuted NHWC tensor keeps channels-last
        # strides through torch convs and crashes the reference's .view()
        x_chw = np.random.default_rng(3).normal(size=(2, 1, 32, 32)).astype(np.float32)
        x = x_chw.transpose(0, 2, 3, 1)
        with torch.no_grad():
            t_recon, t_dist, t_latent, _ = ref(torch.tensor(x_chw))
        recon, dist, latent, _ = model.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x),
            train=False)
        np.testing.assert_allclose(np.asarray(dist["cont"][0]),
                                   t_dist["cont"][0].numpy(), rtol=1e-3,
                                   atol=1e-3)
        # logvar: eval reparam uses only the mean, so without this the
        # fc_log_var import is pinned by no forward comparison
        np.testing.assert_allclose(np.asarray(dist["cont"][1]),
                                   t_dist["cont"][1].numpy(), rtol=1e-3,
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(dist["disc"][0]),
                                   t_dist["disc"][0].numpy(), rtol=1e-3,
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(latent), t_latent.numpy(),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(recon), t_recon.permute(0, 2, 3, 1).numpy(),
            rtol=1e-3, atol=1e-3)


class TestSmoothVaeSvhnImport:
    def test_svhn_eval_forward_matches(self, torch_ref):
        """svhn_VAE has a WIDER decoder than mnist's (ConvT 128->64->32->3,
        svhn_vae.py:124-132) — this pins the decoder_channels=(64,32)
        config the mnist-shaped default would silently get wrong."""
        torch = torch_ref
        import svhn_vae as ref_mod

        torch.manual_seed(0)
        ref = ref_mod.svhn_VAE(img_size=(3, 32, 32),
                               latent_spec={"cont": 32, "disc": [10]},
                               use_cuda=False)
        ref.eval()

        from shotvae_tpu.io.torch_compat import (import_smooth_vae_state_dict,
                                                 merge_imported)
        from shotvae_tpu.models import SmoothVAE, svhn_vae_config
        from shotvae_tpu.train.state import init_model

        cfg = svhn_vae_config()
        cfg["latent_cont_dim"] = 32
        model = SmoothVAE(**cfg)
        params, stats = init_model(model, jax.random.key(0),
                                   jnp.zeros((1, 32, 32, 3)))
        ip, _ = import_smooth_vae_state_dict(
            ref.state_dict(), encoder_channels=(32, 64, 128),
            reshape_channels=128)
        params, stats = merge_imported(params, stats, ip, {})

        x_chw = np.random.default_rng(4).normal(
            size=(2, 3, 32, 32)).astype(np.float32)
        x = np.ascontiguousarray(x_chw.transpose(0, 2, 3, 1))
        with torch.no_grad():
            t_recon, t_dist, t_latent, _ = ref(torch.tensor(x_chw))
        recon, dist, latent, _ = model.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x),
            train=False)
        np.testing.assert_allclose(np.asarray(dist["cont"][0]),
                                   t_dist["cont"][0].numpy(), rtol=1e-3,
                                   atol=1e-3)
        # logvar: eval reparam uses only the mean, so without this the
        # fc_log_var import is pinned by no forward comparison
        np.testing.assert_allclose(np.asarray(dist["cont"][1]),
                                   t_dist["cont"][1].numpy(), rtol=1e-3,
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(dist["disc"][0]),
                                   t_dist["disc"][0].numpy(), rtol=1e-3,
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(latent), t_latent.numpy(),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(recon), t_recon.permute(0, 2, 3, 1).numpy(),
            rtol=1e-3, atol=1e-3)


class TestMLPClassifierImport:
    def test_forward_matches(self, torch_ref):
        torch = torch_ref
        sys.path.insert(0, os.path.join(REF, "classifier_model"))
        import mlp as ref_mod

        torch.manual_seed(0)
        ref = ref_mod.MLP(num_classes=10)
        ref.eval()

        from shotvae_tpu.io.torch_compat import import_mlp_state_dict, merge_imported
        from shotvae_tpu.models import MLPClassifier
        from shotvae_tpu.train.state import init_model

        model = MLPClassifier(num_classes=10)
        params, stats = init_model(model, jax.random.key(0),
                                   jnp.zeros((1, 32, 32, 1)))
        ip, istats = import_mlp_state_dict(ref.state_dict())
        params, stats = merge_imported(params, stats, ip, istats)

        # build NCHW natively: a permuted NHWC tensor with C=1 is classified
        # channels-last by torch, which flips the conv output layout and
        # breaks the reference's .view()
        x_nchw = np.random.default_rng(2).normal(
            size=(3, 1, 32, 32)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x_nchw)).numpy()
        x = np.ascontiguousarray(x_nchw.transpose(0, 2, 3, 1))
        got = model.apply({"params": params, "batch_stats": stats or {}},
                          jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
