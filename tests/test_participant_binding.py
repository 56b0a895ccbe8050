"""PreciceParticipant binding coverage via a stub `precice` module.

libprecice/pyprecice are not installable in this image, so the real binding
(`adapter/participant.py` PreciceParticipant, the camelCase->snake_case
mapping of the pyprecice v3 surface used by `adapter.h:217-225,324-384,
447-489`) is exercised against an injected `sys.modules['precice']` stub
that records every call.
"""

import sys
import types

import numpy as np
import pytest

from dealii_adapter_tpu.adapter.participant import (
    Participant,
    PreciceParticipant,
    make_participant,
)


class _RecordingParticipant:
    """Stands in for precice.Participant; records (method, args) calls."""

    def __init__(self, name, config, rank, size):
        self.calls = [("__init__", (name, config, rank, size))]

    def _rec(self, method, *args):
        self.calls.append((method, args))

    def get_mesh_dimensions(self, mesh_name):
        self._rec("get_mesh_dimensions", mesh_name)
        return 3

    def set_mesh_vertices(self, mesh_name, coords):
        self._rec("set_mesh_vertices", mesh_name, coords)
        return np.arange(len(coords), dtype=np.int32)

    def requires_initial_data(self):
        self._rec("requires_initial_data")
        return False

    def initialize(self):
        self._rec("initialize")

    def read_data(self, mesh_name, data_name, ids, relative_dt):
        self._rec("read_data", mesh_name, data_name, ids, relative_dt)
        return np.zeros((len(ids), 3))

    def write_data(self, mesh_name, data_name, ids, values):
        self._rec("write_data", mesh_name, data_name, ids, values)

    def advance(self, dt):
        self._rec("advance", dt)

    def is_coupling_ongoing(self):
        self._rec("is_coupling_ongoing")
        return True

    def get_max_time_step_size(self):
        self._rec("get_max_time_step_size")
        return 0.25

    def is_time_window_complete(self):
        self._rec("is_time_window_complete")
        return True

    def requires_writing_checkpoint(self):
        self._rec("requires_writing_checkpoint")
        return True

    def requires_reading_checkpoint(self):
        self._rec("requires_reading_checkpoint")
        return False

    def finalize(self):
        self._rec("finalize")


@pytest.fixture
def stub_precice(monkeypatch):
    mod = types.ModuleType("precice")
    mod.Participant = _RecordingParticipant
    monkeypatch.setitem(sys.modules, "precice", mod)
    return mod


def test_constructor_forwards_name_config_rank_size(stub_precice):
    p = PreciceParticipant("Solid", "precice-config.xml", rank=2, size=4)
    assert p._p.calls[0] == ("__init__", ("Solid", "precice-config.xml", 2, 4))


def test_all_14_methods_map_to_snake_case_with_args(stub_precice):
    p = PreciceParticipant("Solid", "cfg.xml")
    inner = p._p

    coords = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]])
    ids = np.array([0, 1], dtype=np.int32)
    values = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])

    assert p.getMeshDimensions("Solid-Mesh") == 3
    out_ids = p.setMeshVertices("Solid-Mesh", coords)
    np.testing.assert_array_equal(out_ids, [0, 1])
    assert p.requiresInitialData() is False
    p.initialize()
    data = p.readData("Solid-Mesh", "Stress", ids, 0.01)
    assert data.shape == (2, 3)
    p.writeData("Solid-Mesh", "Displacement", ids, values)
    p.advance(0.01)
    assert p.isCouplingOngoing() is True
    assert p.getMaxTimeStepSize() == 0.25
    assert p.isTimeWindowComplete() is True
    assert p.requiresWritingCheckpoint() is True
    assert p.requiresReadingCheckpoint() is False
    p.finalize()

    methods = [c[0] for c in inner.calls[1:]]
    assert methods == [
        "get_mesh_dimensions",
        "set_mesh_vertices",
        "requires_initial_data",
        "initialize",
        "read_data",
        "write_data",
        "advance",
        "is_coupling_ongoing",
        "get_max_time_step_size",
        "is_time_window_complete",
        "requires_writing_checkpoint",
        "requires_reading_checkpoint",
        "finalize",
    ]
    by_name = dict((c[0], c[1]) for c in inner.calls[1:])
    assert by_name["get_mesh_dimensions"] == ("Solid-Mesh",)
    assert by_name["set_mesh_vertices"][0] == "Solid-Mesh"
    np.testing.assert_array_equal(by_name["set_mesh_vertices"][1], coords)
    rd = by_name["read_data"]
    assert rd[0] == "Solid-Mesh" and rd[1] == "Stress" and rd[3] == 0.01
    np.testing.assert_array_equal(rd[2], ids)
    wd = by_name["write_data"]
    assert wd[0] == "Solid-Mesh" and wd[1] == "Displacement"
    np.testing.assert_array_equal(wd[2], ids)
    np.testing.assert_array_equal(wd[3], values)
    assert by_name["advance"] == (0.01,)


def test_binding_satisfies_participant_protocol(stub_precice):
    p = PreciceParticipant("Solid", "cfg.xml")
    assert isinstance(p, Participant)


def test_make_participant_constructs_real_binding(stub_precice):
    class P:
        participant_name = "Solid"
        config_file = "precice-config.xml"

    p = make_participant(P())
    assert isinstance(p, PreciceParticipant)
    assert p._p.calls[0] == ("__init__", ("Solid", "precice-config.xml", 0, 1))


def test_import_error_guidance_without_pyprecice(monkeypatch):
    monkeypatch.setitem(sys.modules, "precice", None)  # force ImportError
    with pytest.raises(ImportError, match="FakeParticipant"):
        PreciceParticipant("Solid", "cfg.xml")
