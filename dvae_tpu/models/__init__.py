from dvae_tpu.models.blocks import MLP, GaussianSample, Classifier, Classifier2Classes, Encoder, Decoder
from dvae_tpu.models.vae import VAE
from dvae_tpu.models.cvae import CVAE, CVAE_v2, CVAE_v3, CVAE_v4, EncoderClassifier
from dvae_tpu.models.disentangled import DisentangledVAE
from dvae_tpu.models.lstm_vad import LSTMVad
from dvae_tpu.models.video_vad import AVVad, LipEncoder, VideoVad

def init_params(model, rngs, *args, **kwargs):
    """Initialize a model's full parameter tree.

    Uses the model's ``init_all`` method when present (models whose
    ``__call__`` does not touch every submodule, e.g. the classifier heads).
    """
    if hasattr(model, "init_all"):
        return model.init(rngs, *args, method="init_all", **kwargs)
    return model.init(rngs, *args, **kwargs)


# Reference-name aliases (sp-uhh/disentangled-vae packages/models/models.py)
VariationalAutoencoder = VAE                 # models.py:125
DeepGenerativeModel = CVAE                   # models.py:185
DeepGenerativeModel_v2 = CVAE_v2             # models.py:220
DeepGenerativeModel_v3 = CVAE_v3             # models.py:245
DeepGenerativeModel_v4 = CVAE_v4             # models.py:299
DeepGenerativeModel_v5 = DisentangledVAE     # models.py:390
Encoder_Classifier = EncoderClassifier       # models.py:355
DeepVAD_audio = LSTMVad                      # train_audio_net.py:18 (missing in ref)
VideoClassifier = VideoVad                   # train_audio_net.py:14 (commented/missing in ref)

__all__ = [
    "MLP", "GaussianSample", "Classifier", "Classifier2Classes", "Encoder", "Decoder",
    "VAE", "CVAE", "CVAE_v2", "CVAE_v3", "CVAE_v4", "EncoderClassifier",
    "DisentangledVAE", "LSTMVad", "VideoVad", "AVVad", "LipEncoder", "VideoClassifier",
    "VariationalAutoencoder", "DeepGenerativeModel", "DeepGenerativeModel_v2",
    "DeepGenerativeModel_v3", "DeepGenerativeModel_v4", "DeepGenerativeModel_v5",
    "Encoder_Classifier", "DeepVAD_audio", "init_params",
]
