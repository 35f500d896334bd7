"""CIFAR searchable micro-CNN and its search space
(reference models/search/cifar_searchable.py).

conf rows are [op1, op2, conn1, conn2] with conn in [-2, block_index);
cells are stacked per ``args.net_str`` (2 marks a reduction point where
every accumulated output is downsampled); search-time cells sum unused
blocks, found-arch (fixed=True) cells concat + reduce and double planes
after each reduction (:257-285). Aux head reads the cell at 2/3 depth
(:240-243).
"""

from __future__ import annotations

import numpy as np

from mfas_tpu.core import functional as F
from mfas_tpu.core import init as I
from mfas_tpu.core import layers as L
from mfas_tpu.core.module import Module, ModuleList, Sequential
from mfas_tpu.models.enas_cell import (AuxiliaryHead, Cell, FactorizedReduction,
                                       FixedCell)

OPERATION_LABELS = ['I', '3x3 conv', '5x5 conv', '3x3 depthconv',
                    '5x5 depthconv', '7x7 depthconv', '3x3 maxpool',
                    '3x3 avgpool']


def get_possible_layer_configurations(progression_index):
    """All [op1, op2, conn1, conn2] rows with op1 != op2, conns in
    [-2, progression_index) (:65-79)."""
    num_ops_per_block = 5
    label_list = []
    for op1i in range(num_ops_per_block):
        for op2i in range(num_ops_per_block):
            if op1i == op2i:
                continue
            for bi1 in range(-2, progression_index):
                for bi2 in range(-2, progression_index):
                    label_list.append([op1i, op2i, bi1, bi2])
    return label_list


class Searchable_MicroCNN(Module):
    def __init__(self, args, configuration,
                 operation_labels=OPERATION_LABELS, fixed=False):
        super().__init__()
        self.args = args
        self.fixed = fixed

        conf = np.asarray(configuration, np.int64)
        if conf.ndim == 1:
            conf = conf[None, :]
        self.conf = conf
        self._configuration_indexes = conf[:, 0:2]
        self._connections = conf[:, 2:]
        self._operation_labels = operation_labels
        self._network_shape = args.net_str

        self.input_conv = Sequential(
            L.Conv2d(3, int(args.planes), 3, padding=1, bias=False,
                     weight_init=I.kaiming_uniform(0.0)),
            L.BatchNorm2d(int(args.planes), eps=1e-3))

        self.cell_array, self.pooled_layers = self._create_cell_array()

        self.classifier = L.Linear(int(self.args.planes), args.num_outputs)
        self.dropout_cla = L.Dropout(args.drop_prob)
        self.aux_head = AuxiliaryHead(args.num_outputs, self.args.planes)

        # the reference re-draws EVERY Conv2d weight of the assembled net
        # with kaiming_uniform(fan_in, relu) — cells, separable convs,
        # pool branches, factorized reductions, aux head included; biases
        # and Linears keep torch defaults (cifar_searchable.py:215-217)
        ku = I.kaiming_uniform(0.0)
        for m in self.modules():
            if isinstance(m, L.Conv2d):
                m.weight_init = ku

    def _create_cell_array(self):
        cell_array = ModuleList()
        pooled_layers = ModuleList()
        for layer_red in self._network_shape:
            cls = FixedCell if self.fixed else Cell
            cell_array.append(cls(self._operation_labels,
                                  self._configuration_indexes,
                                  self._connections, self.args))
            if layer_red == 2:
                for _ in range(len(cell_array) + 1):
                    if self.fixed:
                        pooled_layers.append(FactorizedReduction(
                            self.args.planes, self.args.planes * 2))
                    else:
                        pooled_layers.append(FactorizedReduction(
                            self.args.planes, self.args.planes))
                if self.fixed:
                    # the reference mutates args.planes at reduction points
                    # for found-arch training (:282-283)
                    self.args.planes *= 2
        return cell_array, pooled_layers

    def apply(self, tree, ctx, x):
        s = self.sub
        cell_outputs = [self.input_conv(s(tree, "input_conv"), ctx, x)]
        ct = s(tree, "cell_array")
        pt = s(tree, "pooled_layers")

        pool_layer_id = 0
        for index_cell in range(len(self.cell_array)):
            cell = self.cell_array[index_cell]
            if index_cell == 0:
                out = cell(self.sub(ct, index_cell), ctx,
                           cell_outputs[0], cell_outputs[0])
            else:
                out = cell(self.sub(ct, index_cell), ctx,
                           cell_outputs[-2], cell_outputs[-1])
            cell_outputs.append(out)

            if self._network_shape[index_cell] == 2:
                for idx in range(len(cell_outputs)):
                    cell_outputs[idx] = self.pooled_layers[pool_layer_id](
                        self.sub(pt, pool_layer_id), ctx, cell_outputs[idx])
                    pool_layer_id += 1

        out = F.adaptive_avg_pool2d_1x1(cell_outputs[-1])
        out = out.reshape(out.shape[0], -1)
        out = self.dropout_cla({}, ctx, out)
        out = self.classifier(s(tree, "classifier"), ctx, out)

        iout = self.aux_head(s(tree, "aux_head"),
                             ctx, cell_outputs[int(index_cell * 0.666)])
        return out, iout
