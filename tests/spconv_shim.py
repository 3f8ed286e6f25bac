"""Pure-torch spconv 1.0 shim — lets the REFERENCE backbone code
(/root/reference/model/geoformer/geoformer_modules.py) run on CPU without
the external spconv binary, so full-model golden parity tests can pin our
sparse-conv rulebook + weight-layout conventions against the reference
model's actual module graph.

Semantics implemented per spconv 1.0's documented behavior (the PointGroup
fork, docs/INSTALL.md:27-49):
  * weight shape [k0, k1, k2, in, out], kernel dims aligned with the
    spatial dims of `indices[:, 1:]` in order, cross-correlation:
    for output site p, input site = p + offset - padding.
  * SubMConv3d: output sites == input sites (kernel center anchored).
  * SparseConv3d k2 s2 p0: output sites = all p with any occupied 2p+o.
  * SparseInverseConv3d: replays the stored indice_key rulebook backwards
    (fine out[i] += W[o] @ coarse in[j] for every forward pair (i,j,o)),
    restoring the pre-downsample sites in their stored order.

This is a test oracle (tiny scenes, python pair enumeration), not a fast
path. The one convention this cannot decide without the real binary or a
real checkpoint is an overall kernel mirror; it is pinned here to the
cross-correlation reading of spconv's indice math and exposed as the
converter's --mirror_kernel escape hatch.
"""

from __future__ import annotations

import torch
import torch.nn as nn


class SparseConvTensor:
    def __init__(self, features, indices, spatial_shape, batch_size, indice_dict=None):
        self.features = features      # [N, C] float
        self.indices = indices        # [N, 4] int (batch, d0, d1, d2)
        self.spatial_shape = list(spatial_shape)
        self.batch_size = batch_size
        self.indice_dict = {} if indice_dict is None else indice_dict


class SparseModule(nn.Module):
    pass


class SparseSequential(SparseModule):
    """Applies spconv modules to the sparse tensor and plain nn modules to
    its `.features` (mirrors spconv.SparseSequential dispatch)."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        mods = []
        if len(args) == 1 and isinstance(args[0], dict):
            for name, m in args[0].items():
                self.add_module(name, m)
                mods.append(name)
        else:
            for i, m in enumerate(args):
                self.add_module(str(i), m)
                mods.append(str(i))
            for name, m in kwargs.items():
                self.add_module(name, m)
                mods.append(name)
        self._mod_names = mods

    def forward(self, x):
        for name in self._mod_names:
            m = getattr(self, name)
            if isinstance(m, SparseModule):
                x = m(x)
            else:
                x = SparseConvTensor(
                    m(x.features), x.indices, x.spatial_shape, x.batch_size, x.indice_dict
                )
        return x


def _coord_lut(indices):
    return {tuple(r.tolist()): i for i, r in enumerate(indices)}


class SubMConv3d(SparseModule):
    def __init__(self, in_channels, out_channels, kernel_size, padding=0,
                 bias=False, indice_key=None, stride=1):
        super().__init__()
        k = kernel_size if isinstance(kernel_size, (tuple, list)) else (kernel_size,) * 3
        self.k = k
        self.pad = padding if isinstance(padding, (tuple, list)) else (padding,) * 3
        self.weight = nn.Parameter(torch.randn(*k, in_channels, out_channels) * 0.1)
        assert not bias
        self.indice_key = indice_key

    def forward(self, x):
        n = x.indices.shape[0]
        out = x.features.new_zeros(n, self.weight.shape[-1])
        lut = _coord_lut(x.indices)
        idx = x.indices.tolist()
        k0, k1, k2 = self.k
        for o0 in range(k0):
            for o1 in range(k1):
                for o2 in range(k2):
                    rows_in, rows_out = [], []
                    for i, (b, c0, c1, c2) in enumerate(idx):
                        src = (b, c0 + o0 - self.pad[0], c1 + o1 - self.pad[1],
                               c2 + o2 - self.pad[2])
                        j = lut.get(src)
                        if j is not None:
                            rows_in.append(j)
                            rows_out.append(i)
                    if rows_in:
                        out[rows_out] += x.features[rows_in] @ self.weight[o0, o1, o2]
        return SparseConvTensor(out, x.indices, x.spatial_shape, x.batch_size, x.indice_dict)


class SparseConv3d(SparseModule):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, bias=False, indice_key=None):
        super().__init__()
        k = kernel_size if isinstance(kernel_size, (tuple, list)) else (kernel_size,) * 3
        s = stride if isinstance(stride, (tuple, list)) else (stride,) * 3
        self.k, self.s = k, s
        self.pad = padding if isinstance(padding, (tuple, list)) else (padding,) * 3
        self.weight = nn.Parameter(torch.randn(*k, in_channels, out_channels) * 0.1)
        assert not bias
        self.indice_key = indice_key

    def forward(self, x):
        k0, k1, k2 = self.k
        s0, s1, s2 = self.s
        out_shape = [
            (x.spatial_shape[d] + 2 * self.pad[d] - self.k[d]) // self.s[d] + 1
            for d in range(3)
        ]
        out_coords, out_lut, pairs = [], {}, []  # pairs: (in_row, out_row, kpos)
        for i, (b, c0, c1, c2) in enumerate(x.indices.tolist()):
            for o0 in range(k0):
                for o1 in range(k1):
                    for o2 in range(k2):
                        t0, t1, t2 = (c0 + self.pad[0] - o0, c1 + self.pad[1] - o1,
                                      c2 + self.pad[2] - o2)
                        if t0 % s0 or t1 % s1 or t2 % s2:
                            continue
                        p = (b, t0 // s0, t1 // s1, t2 // s2)
                        if not all(0 <= p[1 + d] < out_shape[d] for d in range(3)):
                            continue
                        if p not in out_lut:
                            out_lut[p] = len(out_coords)
                            out_coords.append(p)
                        pairs.append((i, out_lut[p], (o0, o1, o2)))
        out_indices = torch.tensor(out_coords, dtype=x.indices.dtype).reshape(-1, 4)
        out = x.features.new_zeros(len(out_coords), self.weight.shape[-1])
        for i, j, (o0, o1, o2) in pairs:
            out[j] += x.features[i] @ self.weight[o0, o1, o2]
        d = dict(x.indice_dict)
        if self.indice_key:
            d[self.indice_key] = (x.indices, out_indices, pairs)
        return SparseConvTensor(out, out_indices, out_shape, x.batch_size, d)


class SparseInverseConv3d(SparseModule):
    def __init__(self, in_channels, out_channels, kernel_size, bias=False,
                 indice_key=None):
        super().__init__()
        k = kernel_size if isinstance(kernel_size, (tuple, list)) else (kernel_size,) * 3
        self.weight = nn.Parameter(torch.randn(*k, in_channels, out_channels) * 0.1)
        assert not bias and indice_key
        self.indice_key = indice_key

    def forward(self, x):
        fine_indices, coarse_indices, pairs = x.indice_dict[self.indice_key]
        out = x.features.new_zeros(fine_indices.shape[0], self.weight.shape[-1])
        for i, j, (o0, o1, o2) in pairs:  # fwd pair: fine i -> coarse j
            out[i] += x.features[j] @ self.weight[o0, o1, o2]
        fine_shape = [s * 2 for s in x.spatial_shape]
        return SparseConvTensor(out, fine_indices, fine_shape, x.batch_size, x.indice_dict)


class _ModulesNamespace:
    SparseModule = SparseModule


modules = _ModulesNamespace()
