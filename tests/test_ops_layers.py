"""Primitive layer parity vs torch (conv / weight-norm / transposed conv / LN)."""

import numpy as np
import pytest
import torch

from vispeech_tpu.ops import layers as L


def _init(mod, x, rng=0):
    import jax

    return mod.init(jax.random.PRNGKey(rng), x)


class TestConv1d:
    @pytest.mark.parametrize("k,d,groups", [(1, 1, 1), (3, 1, 1), (5, 3, 1), (3, 1, 4)])
    def test_matches_torch(self, k, d, groups):
        torch.manual_seed(0)
        cin, cout, B, T = 8, 12, 2, 16
        tc = torch.nn.Conv1d(cin, cout, k, dilation=d, groups=groups,
                             padding=(k * d - d) // 2)
        x = torch.randn(B, cin, T)
        ref = tc(x).detach().numpy()

        mod = L.Conv1d(cout, k, dilation=d, feature_group_count=groups)
        xj = np.ascontiguousarray(x.numpy().transpose(0, 2, 1))
        params = _init(mod, xj)
        # inject torch weights: torch [cout, cin/g, k] → ours [k, cin/g, cout]
        w = tc.weight.detach().numpy().transpose(2, 1, 0)
        params = {"params": {"kernel": w, "bias": tc.bias.detach().numpy()}}
        out = np.asarray(mod.apply(params, xj)).transpose(0, 2, 1)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_asymmetric_padding(self):
        # FFN-style padding (left=(k-1)//2, right=k//2) for even kernels
        mod = L.Conv1d(4, 4, padding=(1, 2))
        x = np.random.RandomState(0).randn(1, 10, 4).astype(np.float32)
        params = _init(mod, x)
        out = mod.apply(params, x)
        assert out.shape == (1, 13 - 4 + 1 + 0, 4)  # 10 + 3 - 4 + 1 = 10... sanity below
        assert out.shape[1] == 10 + 3 - (4 - 1) - 0  # length = T + pad_sum - k + 1


class TestWNConv1d:
    def test_matches_torch_weight_norm(self):
        torch.manual_seed(1)
        cin, cout, k, B, T = 6, 10, 5, 2, 20
        tc = torch.nn.utils.weight_norm(torch.nn.Conv1d(cin, cout, k, padding=2))
        x = torch.randn(B, cin, T)
        ref = tc(x).detach().numpy()

        mod = L.WNConv1d(cout, k)
        xj = np.ascontiguousarray(x.numpy().transpose(0, 2, 1))
        v = tc.weight_v.detach().numpy().transpose(2, 1, 0)  # [k, cin, cout]
        g = tc.weight_g.detach().numpy().reshape(-1)  # [cout]
        params = {"params": {"v": v, "g": g, "bias": tc.bias.detach().numpy()}}
        out = np.asarray(mod.apply(params, xj)).transpose(0, 2, 1)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_g_init_equals_norm(self):
        import jax

        mod = L.WNConv1d(8, 3)
        x = np.zeros((1, 4, 4), np.float32)
        params = _init(mod, x)["params"]
        norms = np.sqrt((np.asarray(params["v"]) ** 2).sum(axis=(0, 1)))
        np.testing.assert_allclose(np.asarray(params["g"]), norms, rtol=1e-6)


class TestWNConvTranspose1d:
    @pytest.mark.parametrize("k,u", [(16, 8), (4, 2), (4, 4)])
    def test_matches_torch(self, k, u):
        torch.manual_seed(2)
        cin, cout, B, T = 6, 4, 2, 10
        tc = torch.nn.utils.weight_norm(
            torch.nn.ConvTranspose1d(cin, cout, k, u, padding=(k - u) // 2)
        )
        x = torch.randn(B, cin, T)
        ref = tc(x).detach().numpy()

        mod = L.WNConvTranspose1d(cout, k, u)
        xj = np.ascontiguousarray(x.numpy().transpose(0, 2, 1))
        # torch weight [cin, cout, k] → ours [k, cin, cout] spatially flipped
        wv = tc.weight_v.detach().numpy().transpose(2, 0, 1)[::-1].copy()
        g = tc.weight_g.detach().numpy().reshape(-1)  # per-cin
        params = {"params": {"v": wv, "g": g, "bias": tc.bias.detach().numpy()}}
        out = np.asarray(mod.apply(params, xj)).transpose(0, 2, 1)
        assert out.shape == ref.shape == (B, cout, T * u)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


class TestLayerNorm:
    def test_matches_torch(self):
        torch.manual_seed(3)
        B, T, C = 2, 7, 16
        x = torch.randn(B, C, T)
        gamma = torch.randn(C)
        beta = torch.randn(C)
        ref = torch.nn.functional.layer_norm(
            x.transpose(1, -1), (C,), gamma, beta, 1e-5
        ).transpose(1, -1).numpy()

        mod = L.LayerNorm()
        xj = np.ascontiguousarray(x.numpy().transpose(0, 2, 1))
        params = {"params": {"gamma": gamma.numpy(), "beta": beta.numpy()}}
        out = np.asarray(mod.apply(params, xj)).transpose(0, 2, 1)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
