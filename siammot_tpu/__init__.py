"""siammot_tpu — TPU-native SiamMOT (JAX/XLA/Pallas/pjit).

Public surface mirrors the reference entry points
(``build_siammot(cfg)``, ``siammot/modelling/rcnn.py:71``).
"""

__version__ = "0.1.0"


def get_cfg():
    from .configs.defaults import get_cfg as _g
    return _g()


def build_siammot(cfg):
    """cfg -> SiamMOT model wrapper (params created via ``init_params``)."""
    from .models.siammot import SiamMOT
    return SiamMOT(cfg)
