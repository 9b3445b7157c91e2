"""Validates the AE design simplification: the reference's
TriplaneGroupResnetBlock runs a grouped Conv2d (groups=3) over the three
planes zero-padded to a common H x W and then crops
(`blocks.py:164-186, 189-256`).  Because the padding is zero and 'same'
conv padding is also zero, the cropped result equals three INDEPENDENT
per-plane convolutions — which is how sin3dm_tpu implements it
(models/autoencoder.py:_group_block_apply).  Proven here against torch.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _pack(planes, newH, newW):
    out = []
    for p in planes:  # p: [1, C, h, w]
        h, w = p.shape[-2:]
        out.append(F.pad(p, (0, newW - w, 0, newH - h)))
    return torch.cat(out, dim=1)


@pytest.mark.parametrize("ks", [3, 5])
def test_grouped_conv_equals_per_plane(ks):
    rng = np.random.default_rng(0)
    C, Cout = 4, 6
    H, W, D = 9, 7, 5
    xy = torch.from_numpy(rng.standard_normal((1, C, H, W)).astype("f"))
    xz = torch.from_numpy(rng.standard_normal((1, C, H, D)).astype("f"))
    yz = torch.from_numpy(rng.standard_normal((1, C, W, D)).astype("f"))

    wgt = torch.from_numpy(
        rng.standard_normal((3 * Cout, C, ks, ks)).astype("f"))
    bias = torch.from_numpy(rng.standard_normal(3 * Cout).astype("f"))

    newH, newW = max(H, W), max(W, D)
    packed = _pack([xy, xz, yz], newH, newW)
    grouped = F.conv2d(packed, wgt, bias, padding=(ks - 1) // 2, groups=3)

    # crop per-plane (reference decompose, `blocks.py:180-186`)
    g_xy = grouped[:, :Cout, :H, :W]
    g_xz = grouped[:, Cout:2 * Cout, :H, :D]
    g_yz = grouped[:, 2 * Cout:, :W, :D]

    # independent per-plane convs with the same group weights
    for plane, gref, widx in ((xy, g_xy, 0), (xz, g_xz, 1), (yz, g_yz, 2)):
        wi = wgt[widx * Cout:(widx + 1) * Cout]
        bi = bias[widx * Cout:(widx + 1) * Cout]
        sep = F.conv2d(plane, wi, bi, padding=(ks - 1) // 2)
        np.testing.assert_allclose(sep.numpy(), gref.numpy(),
                                   rtol=1e-5, atol=1e-5)
