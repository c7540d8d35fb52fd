"""Restricted-Lua config interpreter tests (utils/luaconfig).

The reference's configs are executable Lua with per-robot and per-domain
override blocks (config/non_markov_localization.cfg:60-310); these tests
cover the interpreter on inline fixtures and — when the read-only reference
tree is present — on the REAL unmodified reference config files.
"""

import os

import numpy as np
import pytest

from hitl_slam_tpu.utils.luaconfig import load_lua_config

# heavy tier: excluded from the smoke run (-m 'not full', README Testing)
pytestmark = pytest.mark.full

REF_CFG_DIR = "/root/reference/HitL-SLAM/config"
REF_CFGS = [os.path.join(REF_CFG_DIR, n)
            for n in ("common.cfg", "robot.cfg",
                      "non_markov_localization.cfg")]


def _write(tmp_path, text):
    p = tmp_path / "t.cfg"
    p.write_text(text)
    return str(p)


def test_tables_arithmetic_helpers(tmp_path):
    p = _write(tmp_path, """
-- comment
domain = "a";
T = {
  x = 1.0 / 40.0;
  ang = deg2rad(90.0);
  off = vec2(0.14, 0.0);
  nested = { deep = 3; };
  flag = true;
};
T.extra = 2 * (3 + 4);
""")
    env = load_lua_config(p)
    t = env["T"]
    assert t["x"] == pytest.approx(0.025)
    assert t["ang"] == pytest.approx(np.pi / 2)
    assert t["off"] == {"x": 0.14, "y": 0.0}
    assert t["nested"]["deep"] == 3
    assert t["flag"] is True
    assert t["extra"] == 14


def test_if_elseif_blocks_and_locked_override(tmp_path):
    p = _write(tmp_path, """
domain = "a";
T = { v = 1; };
if domain == "a" then
  T.v = 10;
elseif domain == "b" then
  T.v = 20;
  T.extra = deg2rad(45);
else
  T.v = 30;
end
""")
    assert load_lua_config(p)["T"]["v"] == 10
    env_b = load_lua_config(p, {"domain": "b"})
    assert env_b["T"]["v"] == 20
    assert env_b["T"]["extra"] == pytest.approx(np.pi / 4)
    assert load_lua_config(p, {"domain": "zzz"})["T"]["v"] == 30


def test_function_definitions_skipped_nil_semantics(tmp_path):
    p = _write(tmp_path, """
function helper(x)
   if x then
      return x;
   end
end
T = { v = 5; };
if Missing == "nope" then
  T.v = 99;
end
if MissingTable.name == "nope" then
  T.v = 98;
end
""")
    assert load_lua_config(p)["T"]["v"] == 5


def test_dotted_override_preserves_table(tmp_path):
    p = _write(tmp_path, """
R = { name = "Sim"; wheels = 4; };
""")
    env = load_lua_config(p, {"R.name": "Cobot3"})
    assert env["R"]["name"] == "Cobot3"
    assert env["R"]["wheels"] == 4   # rest of the constructor survives


@pytest.mark.skipif(not os.path.isdir(REF_CFG_DIR),
                    reason="reference tree not present")
def test_reference_configs_load_unmodified():
    env = load_lua_config(REF_CFGS)
    nml = env["NonMarkovLocalization"]
    # base (cobot domain) values, non_markov_localization.cfg:5-74
    assert env["enml_domain"] == "cobot"
    assert nml["map_name"] == "LGRC3"
    assert nml["point_match_threshold"] == pytest.approx(0.15)
    assert nml["max_stf_angle_error"] == pytest.approx(np.deg2rad(25.0))
    assert nml["max_history"] == 80
    assert nml["robot_laser_offset"] == {"x": 0.15, "y": 0.0}
    assert nml["point_correlation_factor"] == pytest.approx(1 / 40)
    assert env["ProbabilisticObjectMaps"]["min_object_points"] == 600


@pytest.mark.skipif(not os.path.isdir(REF_CFG_DIR),
                    reason="reference tree not present")
def test_reference_domain_and_robot_overrides():
    # freiburg domain block (:184-253)
    nf = load_lua_config(REF_CFGS, {"enml_domain": "freiburg"})[
        "NonMarkovLocalization"]
    assert nf["map_name"] == "freiburg_parkinglot"
    assert nf["max_point_cloud_range"] == pytest.approx(70.0)
    assert nf["point_match_threshold"] == pytest.approx(0.25)
    # orebro domain block (:255-310)
    no = load_lua_config(REF_CFGS, {"enml_domain": "orebro"})[
        "NonMarkovLocalization"]
    assert no["map_name"] == "orebro"
    assert no["max_history"] == 120
    assert no["pose_increment"] == 10
    assert no["min_translation"] == -1   # "no gating" sentinel
    # robot block precedence: Cobot3 (:84-117) applies before domain blocks
    nr = load_lua_config(
        REF_CFGS, {"RobotConfig.name": "Cobot3"})["NonMarkovLocalization"]
    assert nr["robot_laser_offset"] == {"x": 0.14, "y": 0.0}
    assert nr["min_translation"] == pytest.approx(0.1)
    assert nr["min_episode_length"] == 20


@pytest.mark.skipif(not os.path.isdir(REF_CFG_DIR),
                    reason="reference tree not present")
def test_options_from_reference_table():
    from hitl_slam_tpu.models.enml.driver import options_from_table

    env = load_lua_config(REF_CFGS, {"enml_domain": "orebro"})
    eo, ep = options_from_table(env["NonMarkovLocalization"])
    assert eo.max_history == 120
    assert eo.gn_iterations == 20            # max_solver_iterations
    assert eo.point_match_threshold == pytest.approx(0.05)
    assert ep.minimum_node_translation == 0.0   # -1 sentinel -> no gating
    assert ep.max_point_cloud_range == pytest.approx(40.0)
    assert ep.sensor_offset == (0.0, 0.0)


@pytest.mark.skipif(not os.path.isdir(REF_CFG_DIR),
                    reason="reference tree not present")
def test_cli_enml_domain_flag(tmp_path, capsys):
    """cli_enml --config <reference cfgs> --domain freiburg changes the
    parameters (VERDICT r2 item 8 acceptance)."""
    from hitl_slam_tpu.cli_enml import main as enml_main

    out = str(tmp_path / "o")
    # layer a size-only override AFTER the reference cfgs: freiburg's
    # max_history=80 window and max_solver_iterations=50 cost a ~5 min
    # localizer compile on one CPU core (the GN steps are unrolled for TPU
    # pipelining, so compile time is linear in gn_iterations x window
    # size), and neither is what this test asserts — domain resolution
    # (match_threshold) and config layering are
    small = tmp_path / "small.toml"
    small.write_text("[NonMarkovLocalization]\nmax_history = 8\n"
                     "max_solver_iterations = 12\n")
    argv = ["--synthetic", "--steps", "24", "-o", out]
    for c in REF_CFGS + [str(small)]:
        argv += ["--config", c]
    rc = enml_main(argv + ["--domain", "freiburg"])
    assert rc == 0
    cap = capsys.readouterr().out
    assert "domain='freiburg'" in cap
    assert "match_threshold=0.25" in cap
    # the later config file won the per-key merge (layering semantics)
    assert "max_history=8" in cap


@pytest.mark.skipif(not os.path.isdir(REF_CFG_DIR),
                    reason="reference tree not present")
def test_cli_enml_cross_file_robot_config(tmp_path, capsys):
    """The reference workflow edits robot.cfg's name in place; the CLI must
    evaluate all Lua files in ONE shared interpreter env so robot.cfg's
    RobotConfig global drives non_markov_localization.cfg's per-robot
    override blocks (was silently lost under per-file evaluation)."""
    from hitl_slam_tpu.cli_enml import main as enml_main

    robot = tmp_path / "robot.cfg"
    src = open(os.path.join(REF_CFG_DIR, "robot.cfg")).read()
    robot.write_text(src.replace('name = "Cobot-Sim";', 'name = "Cobot3";'))
    small = tmp_path / "small.toml"
    small.write_text("[NonMarkovLocalization]\nmax_history = 8\n"
                     "max_solver_iterations = 8\n")
    out = str(tmp_path / "o")
    argv = ["--synthetic", "--steps", "24", "-o", out]
    for c in [os.path.join(REF_CFG_DIR, "common.cfg"), str(robot),
              os.path.join(REF_CFG_DIR, "non_markov_localization.cfg"),
              str(small)]:
        argv += ["--config", c]
    rc = enml_main(argv)      # NO --robot: the file's own name must fire
    assert rc == 0
    cap = capsys.readouterr().out
    # Cobot3 block (non_markov_localization.cfg:84-117): laser offset 0.14
    assert "sensor_offset=(0.14" in cap
    # the orebro-domain PARAMETER resolution is asserted compile-free in
    # test_options_from_reference_table (a second full localizer compile
    # at different EnmlOptions costs ~4 min of CPU suite time)
