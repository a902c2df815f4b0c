"""Compute kernels: GRU recurrences (lax.scan reference path + Pallas fused path)."""

from vae_connexe_tpu.ops.dispatch import gru_sequence, heads_recurrence, set_fused
from vae_connexe_tpu.ops.gru import (
    GRUParams,
    gru_cell,
    gru_scan,
    gru_scan_heads,
    gru_step_heads,
    init_gru,
    init_stacked_gru,
)
from vae_connexe_tpu.ops.rnn_cells import (
    LSTMCellParams,
    RNNCellParams,
    init_lstm_cell,
    init_rnn_cell,
    lstm_cell,
    lstm_scan,
    rnn_cell,
    rnn_scan,
)

__all__ = [
    "GRUParams",
    "LSTMCellParams",
    "RNNCellParams",
    "gru_cell",
    "gru_scan",
    "gru_scan_heads",
    "gru_sequence",
    "gru_step_heads",
    "heads_recurrence",
    "init_gru",
    "init_lstm_cell",
    "init_rnn_cell",
    "init_stacked_gru",
    "lstm_cell",
    "lstm_scan",
    "rnn_cell",
    "rnn_scan",
    "set_fused",
]
