"""ColumnCompactor: one-hot select matmul over dense bank planes."""

import numpy as np

from sigdigger_tpu.kernels.compact import (
    ColumnCompactor,
    ColumnCompactorConfig,
)


def test_compact_selects_columns_multi_tile():
    rng = np.random.default_rng(3)
    m, c, w = 512, 256, 8          # 2 channel tiles -> accumulation path
    comp = ColumnCompactor(ColumnCompactorConfig(
        n_rows=m, n_channels=c, width=w, n_planes=2, channel_tile=128))
    cols = [3, 130, 255, 64]
    comp.set_mapping(cols)
    x1 = rng.standard_normal((m, c)).astype(np.float32)
    x2 = rng.standard_normal((m, c)).astype(np.float32)
    o1, o2 = comp(x1, x2)
    assert o1.shape == (m, w)
    np.testing.assert_allclose(o1[:, :4], x1[:, cols], atol=1e-6)
    np.testing.assert_allclose(o2[:, :4], x2[:, cols], atol=1e-6)
    np.testing.assert_array_equal(o1[:, 4:], 0.0)


def test_remap_without_recompile():
    m, c, w = 128, 128, 4
    comp = ColumnCompactor(ColumnCompactorConfig(
        n_rows=m, n_channels=c, width=w, n_planes=1))
    x = np.arange(m * c, dtype=np.float32).reshape(m, c)
    call0 = comp._call
    comp.set_mapping([5])
    (o,) = comp(x)
    np.testing.assert_allclose(o[:, 0], x[:, 5], atol=1e-6)
    comp.set_mapping([7, 2])
    (o,) = comp(x)
    np.testing.assert_allclose(o[:, 0], x[:, 7], atol=1e-6)
    np.testing.assert_allclose(o[:, 1], x[:, 2], atol=1e-6)
    assert comp._call is call0
