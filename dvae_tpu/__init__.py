"""dvae_tpu — TPU-native speech-enhancement VAE framework.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of
sp-uhh/disentangled-vae (arXiv:2105.08970): VAE speech priors (M1, M2,
M2-info/disentangled), an on-device batched MCEM enhancement engine
(NMF noise model + Metropolis-Hastings latent sampling + Wiener filter),
a jittable STFT/ISTFT signal frontend, dataset builders for NTCD-TIMIT,
and evaluation metrics — all structured for SPMD execution over a
`jax.sharding.Mesh` instead of the reference's process pools.

Layout:
    ops/       jittable signal processing (STFT/ISTFT, VAD/IBM targets, video)
    models/    Flax model families (M1, M2 variants, disentangled v5, LSTM VAD)
    enhance/   MCEM enhancement engine (lax.scan EM, vmapped over utterances)
    train/     training loops, adversarial two-optimizer step, checkpointing
    parallel/  mesh construction + sharding helpers (data-parallel scale-out)
    data/      catalogs (NTCD-TIMIT/QUT/DEMAND), HDF5 pipelines, wav I/O
    eval/      SI-SDR / STOI metrics + CI stats tables
    utils/     misc helpers (param counting, logging, timers)
"""

__version__ = "0.1.0"
