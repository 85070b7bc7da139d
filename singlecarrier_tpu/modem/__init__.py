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
from .rx_production import (
    ProdRxState,
    ProdRxOut,
    prod_rx_init,
    prod_rx_frame,
    prod_rx_stream,
    make_prod_rx_fn,
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
    "ProdRxState",
    "ProdRxOut",
    "prod_rx_init",
    "prod_rx_frame",
    "prod_rx_stream",
    "make_prod_rx_fn",
]
