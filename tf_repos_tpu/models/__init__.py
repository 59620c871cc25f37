"""Model registry — one name per algorithm the reference ships.

Reference zoo (deep_ctr/README.md:36 and DeepMTL): LR, Wide&Deep (wide /
deep / wide_n_deep), FNN, IPNN (Inner), OPNN (Outer), DeepFM, NFM, AFM,
DCN, DeepMVM, DIN, ESMM (DeepCvrMTL).
"""

from __future__ import annotations

from typing import Callable, Dict

from tf_repos_tpu.config import Config
from tf_repos_tpu.models.afm import AFM
from tf_repos_tpu.models.base import CtrModel
from tf_repos_tpu.models.dcn import DCN
from tf_repos_tpu.models.deepfm import DeepFM
from tf_repos_tpu.models.deepmvm import DeepMVM
from tf_repos_tpu.models.din import DIN
from tf_repos_tpu.models.esmm import ESMM
from tf_repos_tpu.models.lr import LR
from tf_repos_tpu.models.nfm import NFM
from tf_repos_tpu.models.pnn import PNN
from tf_repos_tpu.models.wide_deep import WideDeep

_REGISTRY: Dict[str, Callable[[Config], CtrModel]] = {
    "lr": LR,
    "deepfm": DeepFM,
    "nfm": NFM,
    "afm": AFM,
    "dcn": DCN,
    "deepmvm": DeepMVM,
    "din": DIN,
    "esmm": ESMM,
    "deepcvrmtl": ESMM,
    "pnn": PNN,
    "fnn": lambda cfg: PNN(cfg, model_type="FNN"),
    "ipnn": lambda cfg: PNN(cfg, model_type="Inner"),
    "inner": lambda cfg: PNN(cfg, model_type="Inner"),
    "opnn": lambda cfg: PNN(cfg, model_type="Outer"),
    "outer": lambda cfg: PNN(cfg, model_type="Outer"),
    "wide_n_deep": WideDeep,
    "widedeep": WideDeep,
    "wdl": WideDeep,
    "wide": lambda cfg: WideDeep(cfg, model_type="wide"),
    "deep": lambda cfg: WideDeep(cfg, model_type="deep"),
}

# batch layout each model consumes (harness picks the matching dataset)
INPUT_FORMAT: Dict[str, str] = {
    "DIN": "aliccp",
    "ESMM": "aliccp",
    "wide_n_deep": "csv",
}


def model_names():
    return sorted(_REGISTRY)


def create_model(cfg: Config) -> CtrModel:
    key = cfg.model.lower()
    if key not in _REGISTRY:
        raise ValueError(f"unknown model {cfg.model!r}; choose from {model_names()}")
    return _REGISTRY[key](cfg)


def input_format(model: CtrModel) -> str:
    return INPUT_FORMAT.get(model.name, "libsvm")
