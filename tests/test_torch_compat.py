"""Cross-framework golden test: reference torch models vs our flax models.

Builds the ACTUAL reference model classes (imported from /root/reference,
CPU, eval mode), converts their state_dict with io.torch_compat, and checks
our forward pass reproduces the torch outputs to float32 tolerance. This is
the strongest parity evidence available without CIFAR on disk.

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
def torch_modules():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.join(REF, "shot_vae_model"))
    # shot_vae_model and classifier_model BOTH define `wideresnet` (and the
    # reference imports siblings by bare name): purge any variant another
    # test file left in sys.modules (e.g. test_lockstep_long_horizon runs
    # alphabetically earlier and imports the classifier one) so module
    # identity is deterministic regardless of test order — the same
    # discipline as test_train_lockstep._fresh_ref_import.
    for m in ("wideresnet", "vae", "decoder", "preactresnet", "densenet",
              "mlpvae"):
        sys.modules.pop(m, None)
    import wideresnet as ref_wrn  # noqa: E402

    return torch, ref_wrn


class TestWideResNetImport:
    def test_forward_matches_reference(self, torch_modules):
        torch, ref_wrn = torch_modules
        torch.manual_seed(0)
        ref = ref_wrn.WideResNet(num_input_channels=3, depth=10, width=1,
                                 data_parallel=False, small_input=True)
        ref.eval()
        state_dict = {k: v for k, v in ref.state_dict().items()}

        from shotvae_tpu.io.torch_compat import import_torch_state_dict, merge_imported
        from shotvae_tpu.models import WideResNet
        from shotvae_tpu.train.state import init_model

        model = WideResNet(depth=10, width=1)
        params, stats = init_model(model, jax.random.key(0),
                                   jnp.zeros((1, 32, 32, 3)))
        imported_p, imported_s = import_torch_state_dict(state_dict,
                                                         "wideresnet")
        params, stats = merge_imported(params, stats, imported_p, imported_s)

        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.tensor(x).permute(0, 3, 1, 2))
        want = want.permute(0, 2, 3, 1).numpy()
        got = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3,
                                   atol=1e-3)


class TestVAEImport:
    def test_encoder_heads_and_decoder_match(self, torch_modules):
        torch, _ = torch_modules
        # the reference vae module imports its siblings by bare name; the
        # fixture already put shot_vae_model on sys.path
        import vae as ref_vae  # noqa: E402

        torch.manual_seed(0)
        # reference Sample.forward calls .cuda(); avoid it by exercising the
        # deterministic pieces: encoder+heads, and the decoder on a fixed z
        ref = ref_vae.VariationalAutoEncoder(
            encoder_name="wideresnet-10-1", num_input_channels=3,
            img_size=(32, 32), data_parallel=False,
            continuous_latent_dim=8, disc_latent_dim=10, small_input=True)
        ref.eval()

        from shotvae_tpu.io.torch_compat import import_torch_state_dict, merge_imported
        from shotvae_tpu.models import VariationalAutoEncoder
        from shotvae_tpu.train.state import init_model

        model = VariationalAutoEncoder(encoder_name="wideresnet-10-1",
                                       continuous_latent_dim=8,
                                       disc_latent_dim=10)
        params, stats = init_model(model, jax.random.key(0),
                                   jnp.zeros((1, 32, 32, 3)))
        imported_p, imported_s = import_torch_state_dict(ref.state_dict(),
                                                         "vae")
        params, stats = merge_imported(params, stats, imported_p, imported_s)
        variables = {"params": params, "batch_stats": stats}

        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
        tx = torch.tensor(x).permute(0, 3, 1, 2)
        with torch.no_grad():
            feats = ref.feature_extractor(tx)
            avg = ref.global_avg(feats).view(2, -1)
            want_mean = ref.continuous_inference.mean(avg).numpy()
            want_ls = ref.continuous_inference.log_sigma(avg).numpy()
            want_la = ref.disc_latent_inference(avg).numpy()
        got_mean, got_ls, got_la = model.apply(
            variables, jnp.asarray(x), train=False, method="encode")
        np.testing.assert_allclose(np.asarray(got_mean), want_mean,
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(got_ls), want_ls,
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(got_la), want_la,
                                   rtol=1e-3, atol=2e-3)

        # decoder on a fixed latent (B, 18) -> reference wants (B, 18, 1, 1)
        z = rng.normal(size=(2, 18)).astype(np.float32)
        with torch.no_grad():
            want_rec = ref.feature_reconstructor(
                torch.tensor(z).view(2, 18, 1, 1))
        want_rec = want_rec.permute(0, 2, 3, 1).numpy()
        got_rec = model.apply(variables, jnp.asarray(z), train=False,
                              method="decode")
        np.testing.assert_allclose(np.asarray(got_rec), want_rec,
                                   rtol=1e-3, atol=1e-3)


class TestClassifierImport:
    def test_logits_match_reference(self, torch_modules):
        torch, _ = torch_modules
        sys.path.insert(0, os.path.join(REF, "classifier_model"))
        import importlib
        import wideresnet as maybe_cls

        # both model dirs define wideresnet.py; make sure we have the
        # classifier variant (it has a `classification` head)
        if not hasattr(maybe_cls.WideResNet(data_parallel=False,
                                            small_input=True,
                                            depth=10, width=1),
                       "classification"):
            maybe_cls = importlib.reload(maybe_cls)
        torch.manual_seed(0)
        ref = maybe_cls.WideResNet(num_input_channels=3, depth=10, width=1,
                                   num_classes=10, data_parallel=False,
                                   small_input=True)
        ref.eval()

        from shotvae_tpu.io.torch_compat import import_torch_state_dict, merge_imported
        from shotvae_tpu.models import WideResNetClassifier
        from shotvae_tpu.train.state import init_model

        model = WideResNetClassifier(depth=10, width=1, num_classes=10)
        params, stats = init_model(model, jax.random.key(0),
                                   jnp.zeros((1, 32, 32, 3)))
        imported_p, imported_s = import_torch_state_dict(ref.state_dict(),
                                                         "classifier")
        params, stats = merge_imported(params, stats, imported_p, imported_s)

        rng = np.random.default_rng(3)
        x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
        got = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3,
                                   atol=1e-3)
