"""CLI driver tests (the `elasticity.cc` main-path analog)."""

import os

import numpy as np

from dealii_adapter_tpu.cli import main

PRM = """
subsection Time
  set End time = 0.02
  set Time step size = 0.01
  set Output interval = 1
  set Output folder = {out}
end
subsection System properties
  set Shear modulus = 0.5e6
  set Poisson's ratio = 0.4
  set rho = 1000
end
subsection Solver
  set Model = {model}
  set Solver type = CG
end
subsection Discretization
  set Polynomial degree = 1
end
subsection precice configuration
  set Scenario = PF
end
"""


def _write_prm(tmp_path, model):
    out = tmp_path / "out"
    prm = tmp_path / "case.prm"
    prm.write_text(PRM.format(out=str(out), model=model))
    return str(prm), str(out)


def test_cli_linear_standalone(tmp_path, capsys):
    prm, out = _write_prm(tmp_path, "linear")
    rc = main([prm, "--standalone", "--traction", "1000", "0"])
    assert rc == 0
    stdout = capsys.readouterr().out
    assert "model 'linear'" in stdout
    assert "cg_its=" in stdout
    files = sorted(os.listdir(out))
    assert files == ["solution-2d-1.vtu", "solution-2d-2.vtu"]


def test_cli_nonlinear_standalone(tmp_path, capsys):
    prm, out = _write_prm(tmp_path, "neo-Hookean")
    rc = main([prm, "--standalone", "--traction", "2000", "0", "--no-output"])
    assert rc == 0
    stdout = capsys.readouterr().out
    assert "newton_its=" in stdout and "minJ=" in stdout
    assert not os.path.exists(out)
