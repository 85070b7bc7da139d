from .kalman import KalmanState, kalman_init, kalman_update
from .equalizer import (
    EqState,
    eq_init,
    train_step,
    data_step,
    data_step_coherent,
    data_step_nlms,
)

__all__ = [
    "KalmanState",
    "kalman_init",
    "kalman_update",
    "EqState",
    "eq_init",
    "train_step",
    "data_step",
    "data_step_coherent",
    "data_step_nlms",
]
