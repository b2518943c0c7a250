"""Alias module for inventory parity with shot_vae_model/mlpvae.py.

The reference file (/root/reference/shot_vae_model/mlpvae.py, 163 LoC) is a
near-exact duplicate of vae.py — despite its name it contains no MLP, only a
parameter rename (``disc_pseudo_label`` -> ``disc_label_mixup``) — and is
imported nowhere (SURVEY.md §2.2). Rather than duplicating the module, this
alias re-exports the single composition; the renamed keyword corresponds to
``labels_mixup`` in our API.
"""

from shotvae_tpu.models.vae import VariationalAutoEncoder, build_encoder

__all__ = ["VariationalAutoEncoder", "build_encoder"]
