from . import ema, ogm_ge, qmf, vicreg
from .ema import ema_offset, ema_update, masked_batch_mean
from .ogm_ge import modulate_gradients, ogm_coefficients
from .qmf import df as qmf_df
from .qmf import history_update, init_history
from .qmf import reg_loss as qmf_reg_loss
from .vicreg import vicreg_loss

__all__ = [
    "ema",
    "ogm_ge",
    "qmf",
    "vicreg",
    "ema_offset",
    "ema_update",
    "masked_batch_mean",
    "modulate_gradients",
    "ogm_coefficients",
    "qmf_df",
    "history_update",
    "init_history",
    "qmf_reg_loss",
    "vicreg_loss",
]
