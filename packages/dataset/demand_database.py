"""Compat re-export of the DEMAND noise catalog.

Unlike the reference's module (unimportable there: a stale
``from python.utils import get_key``, its demand_database.py:15), this one
imports. The reference's ``dataset_type`` defaults are kept ('test', its
:21/:87) even though DEMAND defines no test split: the reference prints
'Not implemented' and then crashes (UnboundLocalError, :58-69) or globs the
unsplit root (:107-112); here the same call raises NotImplementedError."""

from dvae_tpu.data.catalog import demand as _native
from dvae_tpu.data.catalog.demand import (  # noqa: F401
    noise_segment,
    preprocess_noise,
)


def noise_list(input_noise_dir, dataset_type="test"):
    return _native.noise_list(input_noise_dir, dataset_type)


def noise_list_preprocessed(preprocessed_noise_dir, dataset_type="test"):
    return _native.noise_list_preprocessed(preprocessed_noise_dir, dataset_type)
