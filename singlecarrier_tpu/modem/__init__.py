from .tx import (
    TxState,
    tx_init,
    qpsk_mod,
    qpsk_demod,
    tx_frame,
    tx_packet,
    tx_stream,
)
from .rx import (
    RxState,
    RxOut,
    rx_init,
    rx_frame,
    rx_stream,
    make_rx_stream_fn,
)

__all__ = [
    "TxState",
    "tx_init",
    "qpsk_mod",
    "qpsk_demod",
    "tx_frame",
    "tx_packet",
    "tx_stream",
    "RxState",
    "RxOut",
    "rx_init",
    "rx_frame",
    "rx_stream",
    "make_rx_stream_fn",
]
