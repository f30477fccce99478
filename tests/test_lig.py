"""LIGDataset (solvated-ligand pipeline) driven through a mocked OpenMM/
OpenFF stack (VERDICT r1 item 3: the reference pipeline at
``enflow/data/lig.py:12-61`` must be exercised, not just claimed).

The mock implements exactly the API surface ``enflow_tpu/data/lig.py``
touches — SMILES -> Molecule -> SMIRNOFF template -> solvated Modeller ->
PME system -> LangevinMiddle simulation -> state reporting — with
deterministic fake dynamics, so the test pins the orchestration sequence,
the padding/boxSize branches, the discard/interval reporter semantics, and
the Sample contract of the appended frames. A second test proves the
processed_file cache loads WITHOUT OpenMM present (the ship-a-cache
workflow the module docstring prescribes)."""

import sys
import types

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# minimal OpenMM/OpenFF fake
# ---------------------------------------------------------------------------

class FakeUnit:
    def __init__(self, name):
        self.name = name

    def __rmul__(self, other):
        return Quantity(other, self)

    def __mul__(self, other):
        return Quantity(other, self)

    def __truediv__(self, other):
        return FakeUnit(f"{self.name}/{getattr(other, 'name', other)}")

    def __rtruediv__(self, other):
        return Quantity(other, FakeUnit(f"1/{self.name}"))


class Quantity:
    def __init__(self, value, unit):
        self.value = value
        self.unit = unit

    def value_in_unit(self, unit):
        return self.value

    def __mul__(self, other):
        return Quantity(self.value * other, self.unit)

    __rmul__ = __mul__

    def __rtruediv__(self, other):
        return Quantity(other / self.value, self.unit)


class FakeAtom:
    def __init__(self, symbol):
        self.element = types.SimpleNamespace(symbol=symbol)
        self.metadata = {}


class FakeTopology:
    def __init__(self, symbols, box):
        self._atoms = [FakeAtom(s) for s in symbols]
        self._box = np.asarray(box, float)

    def atoms(self):
        return list(self._atoms)

    def getUnitCellDimensions(self):
        return Quantity(self._box, None)


LIGAND_SYMBOLS = ["C", "C", "O"]          # a fake "CCO"
WATER_SYMBOLS = ["O", "H", "H"] * 2       # two fake solvent molecules


def build_fake_openmm(calls):
    """Construct the fake module tree; ``calls`` records the orchestration."""

    class Molecule:
        def __init__(self):
            self.atoms = [FakeAtom(s) for s in LIGAND_SYMBOLS]
            self.conformers = []

        @classmethod
        def from_smiles(cls, smiles):
            calls.append(("from_smiles", smiles))
            return cls()

        def to_topology(self):
            mol = self

            class _T:
                def to_openmm(self):
                    return FakeTopology([a.element.symbol for a in mol.atoms],
                                        [0.0, 0.0, 0.0])
            return _T()

        def generate_conformers(self, n_conformers):
            calls.append(("generate_conformers", n_conformers))
            self.conformers = [np.zeros((len(self.atoms), 3))]

    class SMIRNOFFTemplateGenerator:
        def __init__(self, molecules):
            calls.append(("smirnoff", molecules))
            self.generator = object()

    class ForceField:
        def __init__(self, *files):
            calls.append(("forcefield", files))

        def registerTemplateGenerator(self, gen):
            calls.append(("register_template", gen))

        def createSystem(self, topology, nonbondedMethod=None,
                         nonbondedCutoff=None, constraints=None):
            calls.append(("create_system", nonbondedMethod, constraints))
            return object()

    class Modeller:
        def __init__(self, topology, positions):
            self.topology = topology
            self.positions = positions

        def addSolvent(self, ff, padding=None, boxSize=None):
            calls.append(("add_solvent", padding, boxSize))
            symbols = ([a.element.symbol for a in self.topology.atoms()]
                       + WATER_SYMBOLS)
            box = (np.full(3, 2.0 * padding.value) if padding is not None
                   else np.asarray(boxSize.value, float))
            self.topology = FakeTopology(symbols, box)
            self.positions = np.linspace(
                0.0, 1.0, len(symbols) * 3).reshape(-1, 3)

    class LangevinMiddleIntegrator:
        def __init__(self, temp, friction, dt):
            calls.append(("integrator", temp.value, friction.value, dt.value))

    class State:
        def __init__(self, pos, vel):
            self._pos, self._vel = pos, vel

        def getPositions(self):
            return Quantity(self._pos, None)

        def getVelocities(self):
            return Quantity(self._vel, None)

    class Context:
        def __init__(self, sim):
            self.sim = sim

        def setPositions(self, pos):
            calls.append(("set_positions", np.asarray(pos).shape))

        def setVelocitiesToTemperature(self, temp):
            calls.append(("thermalize", temp.value))

        def getState(self, getPositions=False, getVelocities=False):
            n = len(self.sim.topology.atoms())
            base = np.linspace(0.0, 1.0, n * 3).reshape(-1, 3)
            # deterministic fake dynamics: drift by step count
            return State(base + 0.01 * self.sim._step,
                         np.full((n, 3), 0.001 * self.sim._step))

    class Simulation:
        def __init__(self, topology, system, integrator):
            self.topology = topology
            self.context = Context(self)
            self._step = 0

        def minimizeEnergy(self):
            calls.append(("minimize",))

        def step(self, n):
            self._step += n
            calls.append(("step", n))

    openmm = types.ModuleType("openmm")
    openmm.LangevinMiddleIntegrator = LangevinMiddleIntegrator
    app = types.ModuleType("openmm.app")
    app.ForceField = ForceField
    app.Modeller = Modeller
    app.Simulation = Simulation
    app.PME = "PME"
    app.HBonds = "HBonds"
    openmm.app = app
    unit = types.ModuleType("openmm.unit")
    for n in ("angstrom", "nanometer", "nanometers", "picosecond",
              "picoseconds", "femtoseconds", "kelvin"):
        setattr(unit, n, FakeUnit(n))
    openmm.unit = unit
    vec3 = types.ModuleType("openmm.vec3")

    class Vec3(tuple):
        def __new__(cls, *args):
            return super().__new__(cls, args)

        def __mul__(self, u):
            return Quantity(np.asarray(self, float), u)
    vec3.Vec3 = Vec3

    omff = types.ModuleType("openmmforcefields")
    omff_gen = types.ModuleType("openmmforcefields.generators")
    omff_gen.SMIRNOFFTemplateGenerator = SMIRNOFFTemplateGenerator
    omff.generators = omff_gen

    openff = types.ModuleType("openff")
    off_tk = types.ModuleType("openff.toolkit")
    off_tk.Molecule = Molecule
    off_units = types.ModuleType("openff.units")
    off_units_mm = types.ModuleType("openff.units.openmm")
    off_units_mm.to_openmm = lambda conf: np.asarray(conf)
    off_units.openmm = off_units_mm
    openff.toolkit = off_tk
    openff.units = off_units

    return {
        "openmm": openmm, "openmm.app": app, "openmm.unit": unit,
        "openmm.vec3": vec3, "openmmforcefields": omff,
        "openmmforcefields.generators": omff_gen, "openff": openff,
        "openff.toolkit": off_tk, "openff.units": off_units,
        "openff.units.openmm": off_units_mm,
    }


@pytest.fixture
def fake_openmm(monkeypatch):
    calls = []
    for name, mod in build_fake_openmm(calls).items():
        monkeypatch.setitem(sys.modules, name, mod)
    return calls


N_TOTAL = len(LIGAND_SYMBOLS) + len(WATER_SYMBOLS)


def make_lig(tmp_path=None, **kw):
    from enflow_tpu.data.lig import LIGDataset
    params = dict(smiles="CCO", force_field=["amber/tip3p_standard.xml"],
                  r_cut=5.0, padding=10.0, temp=300.0, n_iter=6, interval=2,
                  discard=4, dt=0.002, friction=1.0)
    params.update(kw)
    return LIGDataset(**params)


def test_process_orchestration_and_reporter_semantics(fake_openmm):
    ds = make_lig()
    names = [c[0] for c in fake_openmm]
    # the reference pipeline order (lig.py:13-61 + simulated.py:110-133)
    for a, b in [("from_smiles", "smirnoff"), ("smirnoff", "forcefield"),
                 ("forcefield", "register_template"),
                 ("register_template", "generate_conformers"),
                 ("generate_conformers", "add_solvent"),
                 ("add_solvent", "create_system"),
                 ("create_system", "integrator"),
                 ("integrator", "set_positions"),
                 ("set_positions", "minimize"), ("minimize", "thermalize"),
                 ("thermalize", "step")]:
        assert names.index(a) < names.index(b), (a, b, names)
    # PME + HBond constraints reach createSystem (reference lig.py:49-53)
    cs = next(c for c in fake_openmm if c[0] == "create_system")
    assert cs[1] == "PME" and cs[2] == "HBonds"
    # residue metadata stamped on every ligand atom (reference lig.py:21-22)
    # (molecule instance is recorded by the smirnoff call)
    mol = next(c for c in fake_openmm if c[0] == "smirnoff")[1]
    assert all(a.metadata["residue_name"] == "LIG" for a in mol.atoms)
    # discard/interval reporter: n_iter=6, interval=2 -> states at steps
    # 2,4,6; discard=4 keeps steps 4 and 6
    assert len(ds) == 2
    assert "Frame: 4" in ds.samples[0].label
    assert "Frame: 6" in ds.samples[1].label


def test_sample_contract(fake_openmm):
    ds = make_lig()
    s = ds[0]
    assert s.pos.shape == (N_TOTAL, 3)
    assert s.vel.shape == (N_TOTAL, 3)
    # one-hot h over the default CHNOF vocabulary
    assert s.h.shape == (N_TOTAL, s.node_nf)
    assert (s.h.sum(axis=1) == 1).all()
    assert s.z == LIGAND_SYMBOLS + WATER_SYMBOLS
    # solvated box from the Modeller (2 * padding per dim)
    np.testing.assert_allclose(s.box, 20.0)
    assert s.r_cut == 5.0
    assert np.isfinite(s.g).all() and s.g.shape == s.h.shape
    # fake dynamics drift: frame 2 (step 6) sits 0.02 beyond frame 1 (step 4)
    np.testing.assert_allclose(ds[1].pos - ds[0].pos, 0.02, atol=1e-12)


def test_box_branch(fake_openmm):
    ds = make_lig(padding=None, box=[30.0, 25.0, 20.0])
    call = next(c for c in fake_openmm if c[0] == "add_solvent")
    assert call[1] is None and tuple(call[2].value) == (30.0, 25.0, 20.0)
    np.testing.assert_allclose(ds[0].box, [30.0, 25.0, 20.0])


def test_default_discard_keeps_all_frames(fake_openmm):
    ds = make_lig(discard=-1)   # reference: report_from = interval
    assert len(ds) == 3         # steps 2, 4, 6


def test_processed_cache_loads_without_openmm(fake_openmm, tmp_path,
                                              monkeypatch):
    """The ship-a-cache workflow: process once (with the mocked stack),
    then reload from processed_file with OpenMM absent — the load->train
    path must not touch the import."""
    cache = str(tmp_path / "lig.pkl")
    ds = make_lig(processed_file=cache)
    assert len(ds) == 2

    for name in list(sys.modules):
        if name.startswith(("openmm", "openff", "openmmforcefields")):
            monkeypatch.delitem(sys.modules, name)
    monkeypatch.setattr("builtins.__import__", _no_openmm_import)
    ds2 = make_lig(processed_file=cache)
    assert len(ds2) == 2
    np.testing.assert_array_equal(ds2[0].pos, ds[0].pos)


_real_import = __import__


def _no_openmm_import(name, *args, **kwargs):
    if name.startswith(("openmm", "openff", "openmmforcefields")):
        raise ImportError(f"{name} is not installed (test guard)")
    return _real_import(name, *args, **kwargs)


def test_clear_error_without_openmm(monkeypatch):
    for name in list(sys.modules):
        if name.startswith(("openmm", "openff", "openmmforcefields")):
            monkeypatch.delitem(sys.modules, name)
    monkeypatch.setattr("builtins.__import__", _no_openmm_import)
    with pytest.raises(ImportError, match="data-prep only"):
        make_lig()


def test_driver_trains_from_lig_cache(fake_openmm, tmp_path):
    """e2e: dataset mode writes the cache, then train mode consumes
    type: lig via the cache (the reference's dataset-then-train workflow,
    main.py:128-139)."""
    import yaml
    from enflow_tpu.train.driver import Main

    cache = str(tmp_path / "lig.pkl")
    cfg = {
        "mode": "train",
        "units": {"time": "pico", "dist": "ang"},
        "precision": "float64",
        "seed": 3,
        "dataset": {
            "type": "lig", "smiles": "CCO",
            "force_field": ["amber/tip3p_standard.xml"],
            "padding": 10.0, "r_cut": 5.0, "n_iter": 6, "interval": 2,
            "discard": 2, "processed_file": cache,
        },
        "dynamics": {
            "integrator": "lf", "n_iter": 2, "dt": 1,
            "checkpoint_path": str(tmp_path / "lig.cpt"),
            "network": {"hidden_nf": 8},
        },
        "training": {
            "num_epochs": 2, "batch_size": 2, "lr": 1e-3,
            "scheduler": False,
            "loss": {"temp": 300, "softening": 0.5}, "log_interval": 1,
        },
    }
    path = str(tmp_path / "lig.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    m = Main()
    m(path)
    assert (tmp_path / "lig.cpt").exists()
    assert (tmp_path / "lig.pkl").exists()
