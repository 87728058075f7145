"""Model-file round-trips in the reference text format."""

import jax.numpy as jnp
import numpy as np
import pytest

from gp_ss_ak_tpu.model import GPModel, default_model, load_model, save_model


class TestModelFile:
    def test_roundtrip(self, tmp_path):
        m = default_model(input_dim=3)
        m.num_data = 42
        p = str(tmp_path / "model")
        save_model(m, p)
        m2 = load_model(p)
        assert m2.num_data == 42
        assert m2.input_dim == 3
        assert m2.kernel.n_params == m.kernel.n_params
        np.testing.assert_allclose(np.asarray(m2.pack()),
                                   np.asarray(m.pack()), rtol=1e-12)

    def test_file_layout_matches_reference(self, tmp_path):
        """Field order per ToFile_GP_Params (GP_Utils.cpp:1360-1390) and
        kernel blocks per Kernel.cpp:20-40/65-75."""
        m = default_model(input_dim=3)
        m.num_data = 10
        p = str(tmp_path / "model")
        save_model(m, p)
        lines = open(p).read().splitlines()
        assert lines[0].startswith("#")
        keys = [l.split("=")[0] for l in lines[1:] if "=" in l]
        assert keys[:9] == [
            "Inference", "likelihood", "MeanFunction", "numData",
            "outputDim", "inputDim", "NumHyperKernel", "NumHyperLik",
            "NumHyperMean",
        ]
        assert "KernelName=Hyb" in lines
        assert "NumberOfKernels=2" in lines
        assert "KernelName=ExpAns" in lines
        assert "KernelName=Bias" in lines
        assert any(l.startswith("Hyperparams_likelihood=") for l in lines)
        assert "Inference=Lapalce" in lines  # the reference's exact string

    def test_comment_lines_skipped(self, tmp_path):
        m = default_model(input_dim=3)
        p = str(tmp_path / "model")
        save_model(m, p, comment="# one\n# two\n# three")
        m2 = load_model(p)
        assert m2.kernel.n_params == 9

    def test_modified_params_roundtrip(self, tmp_path):
        m = default_model(input_dim=4)
        flat = np.asarray(m.pack())
        flat = flat * 1.3 + 0.01
        m = m.unpack(jnp.asarray(flat))
        p = str(tmp_path / "model")
        save_model(m, p)
        m2 = load_model(p)
        np.testing.assert_allclose(np.asarray(m2.pack()), flat, rtol=1e-6)

    def test_pack_order_kernel_lik_mean(self):
        """Flat order [kernel, lik, mean] (GP_Utils.cpp:101-157)."""
        m = default_model(input_dim=3)
        flat = np.asarray(m.pack())
        assert flat.shape == (10,)  # 8 ExpAns + 1 Bias + 1 lik
        assert flat[0] == pytest.approx(np.pi / 3.1)  # AngleX first
        assert flat[-1] == pytest.approx(0.016)       # sn2 last
