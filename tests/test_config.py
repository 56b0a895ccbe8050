import numpy as np
import pytest

from dealii_adapter_tpu.config import AllParameters, parse_prm


REFERENCE_PRM = "/root/reference/parameters.prm"


def test_defaults_match_reference_structs():
    p = AllParameters()
    assert p.model == "linear"
    assert p.type_lin == "Direct"
    assert p.poly_degree == 3
    assert p.theta == 0.5
    assert p.beta == 0.25
    assert p.gamma == 0.5
    assert p.nu == 0.3
    assert p.rho == 1000.0
    assert p.scenario == "FSI3"
    assert p.data_consistent is True


def test_lambda_derivation():
    # lambda = 2 mu nu / (1 - 2 nu)   (parameters.cc:189)
    p = AllParameters(mu=0.5e6, nu=0.4)
    assert np.isclose(p.lmbda, 2 * 0.5e6 * 0.4 / (1 - 0.8))


def test_kappa_derivation():
    # kappa = 2 mu (1+nu) / (3 (1-2nu))  (compressible_neo_hook_material.h:20)
    p = AllParameters(mu=0.5e6, nu=0.4)
    assert np.isclose(p.kappa, 2 * 0.5e6 * 1.4 / (3 * 0.2))


def test_consistent_vs_conservative_classification():
    assert AllParameters(read_data_name="Stress").data_consistent
    assert AllParameters(read_data_name="StressXYZ").data_consistent
    assert not AllParameters(read_data_name="Force").data_consistent
    with pytest.raises(ValueError):
        AllParameters(read_data_name="Pressure")


def test_parse_reference_prm_file():
    p = parse_prm(REFERENCE_PRM)
    assert p.end_time == 10.0
    assert p.delta_t == 0.005
    assert p.output_interval == 10
    assert p.output_folder == "dealii-output"
    assert p.poly_degree == 3
    assert p.nu == 0.4
    assert p.mu == 0.5e6
    assert p.rho == 1000.0
    assert p.body_force == (0.0, 0.0, 0.0)
    assert p.model == "linear"
    assert p.type_lin == "Direct"
    assert p.max_iterations_lin == 1.0
    assert p.tol_lin == 1e-6
    assert p.max_iterations_NR == 10
    assert p.tol_u == 1e-6
    assert p.tol_f == 1e-9
    assert p.scenario == "FSI3"
    assert p.participant_name == "Solid"
    assert p.mesh_name == "Solid-Mesh"
    assert p.read_data_name == "Stress"
    assert p.write_data_name == "Displacement"


def test_parse_nonlinear_prm_file():
    # uses the "Linear solver" / "Nonlinear solver" subsection spellings
    p = parse_prm("/root/reference/source/nonlinear_elasticity/nonlinear_elasticity.prm")
    assert p.delta_t == 0.01
    assert p.poly_degree == 4
    assert p.beta == 0.25 and p.gamma == 0.5
    assert p.type_lin == "Direct"
    assert p.mesh_name == "Solid_mesh"


def test_overrides():
    p = parse_prm(REFERENCE_PRM, dim=3, model="neo-Hookean")
    assert p.dim == 3 and p.model == "neo-Hookean"
    with pytest.raises(AttributeError):
        parse_prm(REFERENCE_PRM, not_a_param=1)


def test_parse_raw_text():
    p = parse_prm("subsection Time\n set Time step size = 0.5\nend\n")
    assert p.delta_t == 0.5


def test_strict_mode_accepts_reference_files():
    from dealii_adapter_tpu.config import PrmParseError  # noqa: F401

    for f in (
        REFERENCE_PRM,
        "/root/reference/source/nonlinear_elasticity/nonlinear_elasticity.prm",
    ):
        parse_prm(f, strict=True)


def test_strict_mode_rejects_misspelled_key():
    from dealii_adapter_tpu.config import PrmParseError

    text = "subsection Solver\n set Residul = 1e-3\nend\n"
    # lenient: silently keeps the default tolerance (the failure mode
    # strict mode exists to prevent)
    assert parse_prm(text).tol_lin == 1e-6
    with pytest.raises(PrmParseError, match="Residul"):
        parse_prm(text, strict=True)


def test_strict_mode_rejects_unknown_subsection():
    from dealii_adapter_tpu.config import PrmParseError

    text = "subsection Solvr\n set Model = linear\nend\n"
    with pytest.raises(PrmParseError, match="(?i)solvr"):
        parse_prm(text, strict=True)


def test_strict_mode_rejects_garbage_line():
    from dealii_adapter_tpu.config import PrmParseError

    with pytest.raises(PrmParseError, match="unparseable"):
        parse_prm("subsection Time\n sett End time = 1\nend\n", strict=True)
