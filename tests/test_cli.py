"""CLI smoke + end-to-end tests for every tool entry point.

Guards against the round-3 regression class where tools/train.py defined
--remat twice and crashed at arg-parse on EVERY invocation while the whole
test suite stayed green (nothing called get_args_parser()). Reference flag
surfaces: /root/reference/tools/train.py:24-60, tools/eval.py:92.

Fast part: construct each tool's parser, parse a minimal + a defaulted arg
vector, and check --help exits 0. Slow part: drive tools/train.py and
tools/eval.py as real subprocesses on a tiny synthetic dataset.
"""
import importlib
import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

# (module, minimal argv that must parse)
TOOLS = [
    ("tools.train", []),
    ("tools.eval", ["--weights", "w.npck"]),
    ("tools.infer", ["--weights", "w.npck", "--source", "img.jpg"]),
    ("tools.export", ["--weights", "w.npck"]),
    ("tools.quantize", ["--weights", "w.npck", "--data", "d.yaml"]),
    ("tools.flops", []),
    ("tools.vis_dataset", ["--img-dir", "imgs"]),
    ("tools.voc2yolo", ["--xml-dir", "x", "--out-dir", "y"]),
]


@pytest.mark.parametrize("module,minimal", TOOLS, ids=[t[0] for t in TOOLS])
def test_arg_parser_smoke(module, minimal):
    mod = importlib.import_module(module)
    parser = mod.get_args_parser()
    args = parser.parse_args(minimal)
    assert args is not None
    with pytest.raises(SystemExit) as exc:
        parser.parse_args(["--help"])
    assert exc.value.code == 0


def test_train_quant_calib_requires_pretrained():
    """--quant --calib without --pretrained must fail with a clear message,
    not an obscure checkpoint-load error (VERDICT r3 weak #7)."""
    mod = importlib.import_module("tools.train")
    args = mod.get_args_parser().parse_args(
        ["--quant", "--calib", "--output-dir", "/tmp/_cli_smoke"])
    with pytest.raises(SystemExit) as exc:
        mod.main(args)
    assert "--pretrained" in str(exc.value)


def _run_cli(argv, cwd=ROOT, timeout=1800):
    env = dict(os.environ)
    # hermetic: single virtual CPU device, no tunneled-TPU dependency
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    proc = subprocess.run([sys.executable] + argv, cwd=str(cwd), env=env,
                          capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, (
        f"{argv} failed rc={proc.returncode}\nstdout:\n{proc.stdout[-4000:]}"
        f"\nstderr:\n{proc.stderr[-4000:]}")
    return proc


@pytest.mark.slow
def test_train_then_eval_cli_end_to_end(tmp_path):
    """The reference's headline workflow (README: train then eval) as real
    CLI subprocess invocations on a tiny synthetic dataset + tiny graph."""
    from tests.helpers import TINY_GRAPH, make_synth_dataset

    yaml_path = make_synth_dataset(tmp_path / "ds", n_images=8, img_size=96,
                                   seed=4)
    # tiny-graph experiment config: the shipped N config with the graph
    # swapped for the cheap 3-level test graph (full N compile is ~4 min
    # on this 1-core CPU host)
    cfg_path = tmp_path / "tiny_conf.py"
    cfg_path.write_text((ROOT / "configs" / "maf_yolo_n.py").read_text()
                        + f"\nmodel['graph'] = {TINY_GRAPH!r}\n")

    out_dir = tmp_path / "runs"
    _run_cli(["tools/train.py", "--conf", str(cfg_path),
              "--data", yaml_path, "--img-size", "64", "--batch-size", "8",
              "--epochs", "2", "--workers", "2", "--eval-interval", "99",
              "--heavy-eval-range", "0", "--stop-aug-last-n-epoch", "0",
              "--save-interval", "99", "--max-labels", "16", "--bf16", "0",
              "--output-dir", str(out_dir), "--name", "exp", "--seed", "0"])
    ckpt = out_dir / "exp" / "last_ckpt.npck"
    assert ckpt.exists(), f"training CLI produced no checkpoint in {out_dir}"
    assert (out_dir / "exp" / "args.yaml").exists()

    proc = _run_cli(["tools/eval.py", "--weights", str(ckpt),
                     "--data", yaml_path, "--img-size", "64",
                     "--batch-size", "4", "--half", "0", "--workers", "2"])
    assert "AP" in proc.stdout + proc.stderr
