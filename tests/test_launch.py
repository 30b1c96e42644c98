"""Structural tests for launch/3d_mapping.launch.py through stub launch
modules (no ROS2 in the image) — parity with the reference composition
(/root/reference/launch/3d_mapping.launch.py:20-203)."""

import importlib.util
import os
import sys
import types

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LAUNCH_FILE = os.path.join(_REPO, "launch", "3d_mapping.launch.py")

_STUBS = [
    "launch", "launch.actions", "launch.conditions",
    "launch.launch_description_sources", "launch.substitutions",
    "launch_ros", "launch_ros.actions", "ament_index_python",
    "ament_index_python.packages",
]


class _Rec:
    """Generic recording stand-in for launch actions/substitutions."""

    def __init__(self, *a, **kw):
        self.args = a
        self.kwargs = kw


class LaunchDescription:
    def __init__(self):
        self.actions = []

    def add_action(self, a):
        self.actions.append(a)


class DeclareLaunchArgument(_Rec):
    @property
    def name(self):
        return self.args[0]


class ExecuteProcess(_Rec):
    pass


class IncludeLaunchDescription(_Rec):
    pass


class IfCondition(_Rec):
    pass


class LaunchConfiguration(_Rec):
    @property
    def name(self):
        return self.args[0]


class PythonLaunchDescriptionSource(_Rec):
    pass


def _load_launch_module():
    displaced = {n: sys.modules.get(n) for n in _STUBS}

    launch = types.ModuleType("launch")
    launch.LaunchDescription = LaunchDescription
    actions = types.ModuleType("launch.actions")
    actions.DeclareLaunchArgument = DeclareLaunchArgument
    actions.ExecuteProcess = ExecuteProcess
    actions.IncludeLaunchDescription = IncludeLaunchDescription
    conditions = types.ModuleType("launch.conditions")
    conditions.IfCondition = IfCondition
    sources = types.ModuleType("launch.launch_description_sources")
    sources.PythonLaunchDescriptionSource = PythonLaunchDescriptionSource
    subs = types.ModuleType("launch.substitutions")
    subs.LaunchConfiguration = LaunchConfiguration
    launch.actions = actions
    launch.conditions = conditions
    launch.launch_description_sources = sources
    launch.substitutions = subs

    ament = types.ModuleType("ament_index_python")
    packages = types.ModuleType("ament_index_python.packages")

    def get_package_share_directory(name):
        raise KeyError(name)  # no ament index here: Fast-LIO include skipped

    packages.get_package_share_directory = get_package_share_directory
    ament.packages = packages

    sys.modules.update({
        "launch": launch, "launch.actions": actions,
        "launch.conditions": conditions,
        "launch.launch_description_sources": sources,
        "launch.substitutions": subs,
        "ament_index_python": ament,
        "ament_index_python.packages": packages,
    })
    try:
        spec = importlib.util.spec_from_file_location(
            "sonar3d_launch_under_test", _LAUNCH_FILE
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        for n in _STUBS:
            if displaced[n] is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = displaced[n]


@pytest.fixture(scope="module")
def ld():
    mod = _load_launch_module()
    return mod.generate_launch_description()


def test_eleven_launch_arguments_with_yaml_defaults(ld):
    """The reference's 11 launch arguments exist and their defaults come
    from the mapper YAML (reference launch:53-118 seeded by launch:30-34)."""
    decls = {a.name: a for a in ld.actions
             if isinstance(a, DeclareLaunchArgument)}
    assert set(decls) == {
        "use_sim_time", "launch_fast_lio", "launch_rviz", "play_bag",
        "bag_file", "bag_playback_rate", "record_bag", "record_output_path",
        "sonar_orientation.roll", "sonar_orientation.pitch",
        "sonar_orientation.yaw",
    }
    # seeded from config/kiro_tilt60.yaml (the production preset)
    assert decls["sonar_orientation.pitch"].kwargs["default_value"] == "60.0"
    assert decls["bag_playback_rate"].kwargs["default_value"] == "0.5"
    assert decls["use_sim_time"].kwargs["default_value"].lower() == "true"
    for d in decls.values():
        assert d.kwargs.get("description")


def _processes(ld):
    return [a for a in ld.actions if isinstance(a, ExecuteProcess)]


def test_mapper_node_process_with_parameter_layering(ld):
    """The mapper runs as the package module with --params-file + -p
    overrides (the reference's 5-level priority, launch:140-154)."""
    mapper = [p for p in _processes(ld)
              if "sonar_3d_reconstruction_tpu.node" in p.kwargs["cmd"]]
    assert len(mapper) == 1
    cmd = mapper[0].kwargs["cmd"]
    assert "--ros-args" in cmd and "--params-file" in cmd
    yaml_path = cmd[cmd.index("--params-file") + 1]
    assert os.path.exists(yaml_path)
    # launch-level -p overrides for use_sim_time + the three orientation args
    p_overrides = [cmd[i + 1] for i, c in enumerate(cmd) if c == "-p"]
    keys = {o[0] for o in p_overrides}
    assert keys == {
        "use_sim_time:=", "sonar_orientation.roll:=",
        "sonar_orientation.pitch:=", "sonar_orientation.yaw:=",
    }
    assert "condition" not in mapper[0].kwargs  # the mapper always runs


def test_gated_rviz_bag_play_and_record(ld):
    """RViz, bag play (--clock --rate) and bag record (-a -o) processes are
    gated by their launch arguments (reference launch:157-178)."""
    procs = _processes(ld)

    rviz = [p for p in procs if p.kwargs["cmd"][0] == "rviz2"]
    assert len(rviz) == 1
    assert rviz[0].kwargs["cmd"][1] == "-d"
    assert os.path.exists(rviz[0].kwargs["cmd"][2])
    assert rviz[0].kwargs["condition"].args[0].name == "launch_rviz"

    play = [p for p in procs if p.kwargs["cmd"][:3] == ["ros2", "bag", "play"]]
    assert len(play) == 1
    assert "--clock" in play[0].kwargs["cmd"]
    assert "--rate" in play[0].kwargs["cmd"]
    assert play[0].kwargs["condition"].args[0].name == "play_bag"

    rec = [p for p in procs if p.kwargs["cmd"][:3] == ["ros2", "bag", "record"]]
    assert len(rec) == 1
    assert "-a" in rec[0].kwargs["cmd"] and "-o" in rec[0].kwargs["cmd"]
    assert rec[0].kwargs["condition"].args[0].name == "record_bag"


def test_fast_lio_include_when_ament_resolves():
    """With a resolvable fast_lio package the include is added, RViz-off,
    gated by launch_fast_lio (reference launch:121-131)."""
    mod = _load_launch_module()

    import tempfile

    share = tempfile.mkdtemp()
    os.makedirs(os.path.join(share, "launch"), exist_ok=True)

    # patch the ament resolution the module uses at generation time
    fake_pkgs = types.ModuleType("ament_index_python.packages")
    fake_pkgs.get_package_share_directory = lambda name: share
    fake_parent = types.ModuleType("ament_index_python")
    fake_parent.packages = fake_pkgs
    displaced = {
        n: sys.modules.get(n)
        for n in ("ament_index_python", "ament_index_python.packages")
    }
    sys.modules["ament_index_python"] = fake_parent
    sys.modules["ament_index_python.packages"] = fake_pkgs
    try:
        ld = mod.generate_launch_description()
    finally:
        for n, prev in displaced.items():
            if prev is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = prev

    incl = [a for a in ld.actions if isinstance(a, IncludeLaunchDescription)]
    assert len(incl) == 1
    la = dict(incl[0].kwargs["launch_arguments"])
    assert la["rviz"] == "false"
    assert la["config_file"] == "mid360.yaml"
    assert incl[0].kwargs["condition"].args[0].name == "launch_fast_lio"
