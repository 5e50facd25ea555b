"""Torch oracle modules mirroring the reference layer architecture.

Independent torch implementations with the exact same module structure and
state-dict key names as the reference (empose/nn/layers.py) — used in tests
both as numerical oracles and as producers of realistic ``model.pth``
checkpoints for the bridge tests.
"""

from __future__ import annotations

import torch
import torch.nn as nn
from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence


class TorchLinearLayers(nn.Module):
    def __init__(self, hidden_size, num_layers=2, dropout_p=0.0, use_skip=False, use_batch_norm=True):
        super().__init__()
        layers = []
        for _ in range(num_layers):
            layers.append(nn.Linear(hidden_size, hidden_size))
            if use_batch_norm:
                bn = nn.BatchNorm1d(hidden_size)
                nn.init.uniform_(bn.weight)
                layers.append(bn)
            layers.append(nn.PReLU())
            layers.append(nn.Dropout(dropout_p))
        self.layers = nn.Sequential(*layers)
        self.use_skip = use_skip

    def forward(self, x):
        y = self.layers(x)
        return x + y if self.use_skip else y


class TorchMLP(nn.Module):
    def __init__(self, input_size, output_size, hidden_size, num_layers=2, dropout_p=0.0,
                 skip_connection=False, use_batch_norm=True):
        super().__init__()
        self.input_to_hidden = nn.Linear(input_size, hidden_size)
        if use_batch_norm:
            self.batch_norm = nn.BatchNorm1d(hidden_size)
            nn.init.uniform_(self.batch_norm.weight)
        else:
            self.batch_norm = nn.Identity()
        self.activation_fn = nn.PReLU()
        self.dropout = nn.Dropout(dropout_p)
        self.hidden_to_output = nn.Linear(hidden_size, output_size)
        self.hidden_layers = nn.Sequential(
            *[TorchLinearLayers(hidden_size, dropout_p=dropout_p, use_skip=skip_connection,
                                use_batch_norm=use_batch_norm) for _ in range(num_layers)]
        )

    def forward(self, x):
        y = self.input_to_hidden(x)
        y = self.batch_norm(y)
        y = self.activation_fn(y)
        y = self.dropout(y)
        y = self.hidden_layers(y)
        return self.hidden_to_output(y)


class TorchRNNLayer(nn.Module):
    def __init__(self, input_size, hidden_size, num_layers, output_size=None,
                 bidirectional=False, dropout=0.0, learn_init_state=False):
        super().__init__()
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.learn_init_state = learn_init_state
        self.num_directions = 2 if bidirectional else 1
        self.input_drop = nn.Dropout(p=dropout) if dropout > 0.0 else nn.Identity()
        self.init_state = None
        self.final_state = None
        if learn_init_state:
            self.to_init_state_h = nn.Linear(input_size, hidden_size * num_layers * self.num_directions)
            self.to_init_state_c = nn.Linear(input_size, hidden_size * num_layers * self.num_directions)
        self.lstm = nn.LSTM(input_size, hidden_size, num_layers, bidirectional=bidirectional)
        self.to_out = nn.Linear(hidden_size * self.num_directions, output_size) if output_size else nn.Identity()

    def cell_init(self, inputs_):
        if self.learn_init_state:
            c0 = self.to_init_state_c(inputs_[:, 0:1]).squeeze()
            c0 = c0.reshape(-1, self.num_layers, self.hidden_size).transpose(0, 1)
            h0 = self.to_init_state_h(inputs_[:, 0:1]).squeeze()
            h0 = h0.reshape(-1, self.num_layers, self.hidden_size).transpose(0, 1)
            # NOTE: the reference returns (c0, h0), feeding c into torch's h slot.
            return c0, h0
        return self.init_state

    def forward(self, x, seq_lengths):
        inputs_ = self.input_drop(x)
        self.init_state = self.cell_init(inputs_)
        lstm_in = pack_padded_sequence(inputs_, seq_lengths, batch_first=True, enforce_sorted=False)
        lstm_out, final_state = self.lstm(lstm_in, self.init_state)
        self.final_state = final_state
        lstm_out, _ = pad_packed_sequence(lstm_out, batch_first=True, total_length=inputs_.shape[1])
        return self.to_out(lstm_out)


class TorchFeedForwardResidualBlock(nn.Module):
    def __init__(self, input_size, output_size):
        super().__init__()
        self.dense = nn.Linear(input_size, output_size)
        self.activate = nn.ReLU()

    def forward(self, x):
        return self.activate(self.dense(x) + x)
