"""CLI end-to-end: train then test, reference-format artifacts."""

import os

import numpy as np
import pytest

from gp_ss_ak_tpu.cli import main
from gp_ss_ak_tpu.data import write_data

RNG = np.random.default_rng(9)


@pytest.fixture()
def dataset(tmp_path):
    n, m = 80, 30
    X = RNG.uniform(0, 100, size=(n + m, 3))
    y = 1.0 + np.sin(X @ np.array([0.05, 0.02, 0.08])) \
        + 0.05 * RNG.normal(size=n + m)
    train = str(tmp_path / "train.txt")
    test = str(tmp_path / "test.txt")
    write_data(train, X[:n], y[:n])
    write_data(test, X[n:], y[n:])
    return train, test, tmp_path


class TestCLI:
    def test_train_then_test(self, dataset, capsys):
        train, test, tmp = dataset
        model = str(tmp / "m1")
        rc = main(["-pm", "1", "train", "-k", "ExpAns", "-o", "LBFGS",
                   "-#", "30", "--float64", train, model])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        mse_train = float(out[-2])
        assert mse_train < 0.5
        assert os.path.exists(model)
        assert os.path.exists(model + "_Statistics.txt")

        rc = main(["test", "--no-plot", "--float64", test, model, train])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        mse, var_y = float(out[-2]), float(out[-1])
        assert mse < var_y  # beats predicting the mean
        pred = model + "_predict.txt"
        assert os.path.exists(pred)
        first = open(pred).readline()
        assert first.startswith("# SampleNo, Y,")

    def test_wrong_dim_test_file(self, dataset, capsys):
        train, test, tmp = dataset
        model = str(tmp / "m2")
        assert main(["train", "-#", "3", "--float64", train, model]) == 0
        capsys.readouterr()
        bad = str(tmp / "bad.txt")
        X = RNG.normal(size=(5, 2))
        write_data(bad, X, np.zeros(5))
        rc = main(["test", "--no-plot", "--float64", bad, model, train])
        assert rc == 1

    def test_init_params_flag(self, dataset, capsys):
        train, _, tmp = dataset
        model = str(tmp / "m3")
        vals = ",".join(["1.0"] * 9)  # 8 ExpAns + 1 Bias
        rc = main(["train", "-#", "2", "--init-params", vals,
                   "--init-lik", "0.05", "--float64", train, model])
        assert rc == 0
        capsys.readouterr()

    def test_init_params_wrong_count(self, dataset, capsys):
        train, _, tmp = dataset
        rc = main(["train", "--init-params", "1,2", "--float64", train,
                   str(tmp / "m4")])
        assert rc == 1
        capsys.readouterr()


class TestCLI4D:
    def test_train_test_with_rock_type_dimension(self, tmp_path, capsys):
        # 4th input column = rock type (the reference's 4-D ExpAns path,
        # Kernel.cpp:1411-1424); symmetric standardization shares the
        # global min/max over the first 3 columns only
        n, m = 60, 20
        X = RNG.uniform(0, 50, size=(n + m, 4))
        X[:, 3] = RNG.integers(0, 3, size=n + m)  # categorical-ish
        y = np.sin(X[:, 0] * 0.1) + 0.3 * X[:, 3] + \
            0.05 * RNG.normal(size=n + m)
        train = str(tmp_path / "train4.txt")
        test = str(tmp_path / "test4.txt")
        write_data(train, X[:n], y[:n])
        write_data(test, X[n:], y[n:])
        model = str(tmp_path / "m4d")
        assert main(["train", "-#", "25", "--float64", train, model]) == 0
        capsys.readouterr()
        assert main(["test", "--no-plot", "--float64", test, model,
                     train]) == 0
        out = capsys.readouterr().out.strip().splitlines()
        mse, var_y = float(out[-2]), float(out[-1])
        assert mse < var_y


class TestKernelCombos:
    def test_repeatable_kernel_flag(self, dataset, capsys):
        train, test, tmp = dataset
        model = str(tmp / "mc")
        rc = main(["train", "-k", "RBF", "-k", "Exp", "-#", "10",
                   "--float64", train, model])
        assert rc == 0
        capsys.readouterr()
        # model file: Hyb + RBF + Exp + Bias children
        content = open(model).read()
        assert content.count("KernelName=") == 4
        assert "KernelName=RBF" in content and "KernelName=Exp" in content
        rc = main(["test", "--no-plot", "--float64", test, model, train])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert float(out[-2]) < float(out[-1])  # beats the mean

    def test_white_kernel_trains(self, dataset, capsys):
        # the reference would self-recurse training White (Kernel.h:56-59)
        train, _, tmp = dataset
        rc = main(["train", "-k", "White", "-#", "3", "--float64", train,
                   str(tmp / "mw")])
        assert rc == 0
        capsys.readouterr()

    def test_missing_file_clean_error(self, tmp_path, capsys):
        # user errors end with exit 1 + a one-line message, no traceback
        rc = main(["train", "--float64", str(tmp_path / "nope.txt"), "m"])
        assert rc == 1
        err = capsys.readouterr().err
        assert "Error" in err and "Traceback" not in err
        rc = main(["test", "--no-plot", str(tmp_path / "nope.txt"),
                   str(tmp_path / "m"), str(tmp_path / "t.txt")])
        assert rc == 1
        err = capsys.readouterr().err
        assert "Error" in err and "Traceback" not in err


class TestDistributedEngines:
    """--engine dist / ring route the train command through the
    mesh-sharded drivers over every visible device (8 simulated CPU
    devices here) and still produce reference-format artifacts."""

    @pytest.mark.parametrize("engine", ["dist", "ring"])
    def test_train_then_test_with_mesh_engine(self, dataset, engine,
                                              capsys):
        train, test, tmp = dataset
        model = str(tmp / f"m_{engine}")
        rc = main(["-pm", "1", "train", "-#", "6", "--float64",
                   "--engine", engine, train, model])
        assert rc == 0
        assert os.path.exists(model)
        assert os.path.exists(model + "_Statistics.txt")
        capsys.readouterr()
        rc = main(["test", "--no-plot", "--float64", test, model,
                   train])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        mse, var = float(out[-2]), float(out[-1])
        assert np.isfinite(mse)
        assert mse < var  # trained model beats the mean predictor


class TestSegmentedEngine:
    def test_train_then_test_segmented(self, dataset, capsys):
        """--engine iterative --segmented routes the train command
        through the bounded-dispatch evaluator (optim/segmented.py)
        and still produces reference-format artifacts."""
        train, test, tmp = dataset
        model = str(tmp / "m_seg")
        rc = main(["-pm", "1", "train", "-#", "6",
                   "--engine", "iterative", "--segmented",
                   train, model])
        assert rc == 0
        assert os.path.exists(model)
        capsys.readouterr()
        rc = main(["test", "--no-plot", test, model, train])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        mse, var = float(out[-2]), float(out[-1])
        assert np.isfinite(mse)
        assert mse < var

    def test_warped_test_mode_iterative_engine(self, dataset, capsys):
        """A WarpGauss model served through --engine iterative: the
        matrix-free route must produce a finite MSE beating the mean
        predictor (VERDICT r4 #2 / ADVICE r4 medium: this combination
        used to crash in IterativePredictor's likelihood guard)."""
        train, test, tmp = dataset
        model = str(tmp / "mw")
        rc = main(["-pm", "1", "train", "-k", "ExpAns", "-o", "LBFGS",
                   "-#", "25", "-lf", "WarpGauss:tanh1:1",
                   train, model])
        assert rc == 0
        capsys.readouterr()
        rc = main(["test", "--no-plot", "--engine", "iterative",
                   test, model, train])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        mse, var_y = float(out[-2]), float(out[-1])
        assert np.isfinite(mse)
        assert mse < var_y
