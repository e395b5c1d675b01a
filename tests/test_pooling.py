"""Golden test: matmul-based adaptive pooling vs torch semantics
(ref model.py:161 uses nn.AdaptiveAvgPool2d((18, 36)))."""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from seld_tpu.ops.pooling import adaptive_avg_pool_2d, adaptive_pool_matrix


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((16, 1), (18, 36)),  # the CSPDarkNet head's upsampling pool
        ((64, 32), (18, 36)),
        ((7, 5), (3, 2)),
        ((18, 36), (18, 36)),  # identity
        ((5, 7), (10, 14)),  # pure upsample
    ],
)
def test_adaptive_pool_matches_torch(rng, in_hw, out_hw):
    h, w = in_hw
    x = rng.standard_normal((2, h, w, 3)).astype(np.float32)  # NHWC
    got = np.asarray(adaptive_avg_pool_2d(x, out_hw))
    want = (
        tF.adaptive_avg_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), out_hw
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pool_matrix_rows_average_to_one():
    m = adaptive_pool_matrix(16, 18)
    np.testing.assert_allclose(m.sum(axis=0), 1.0, atol=1e-6)
