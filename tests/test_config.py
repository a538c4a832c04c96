import math

from slam_tpu.config import SlamConfig, apply_cli_overrides


def test_defaults_match_reference():
    # Reference defaults from Conf::parse (core.cpp:974-1028).
    c = SlamConfig()
    assert c.V == 3.0
    assert math.isclose(c.MAXG, 30 * math.pi / 180)
    assert c.WHEELBASE == 4.0
    assert c.DT_CONTROLS == 0.025
    assert c.MAX_RANGE == 30.0
    assert c.GATE_REJECT == 4.0
    assert c.GATE_AUGMENT == 25.0
    assert c.NPARTICLES == 100
    assert c.NEFFECTIVE == 75
    assert c.SWITCH_HEADING_KNOWN == 1
    assert c.steps_per_observe == 8


def test_ini_load_webmap(webmap_config):
    c = webmap_config
    assert c.V == 3.0
    assert c.WHEELBASE == 4.0
    assert c.MAX_RANGE == 60.0
    assert math.isclose(c.MAXG, 0.523598775598299, rel_tol=1e-9)
    assert c.SWITCH_HEADING_KNOWN == 0
    assert c.NUMBER_LOOPS == 2


def test_ini_load_loop1(loop1_config):
    c = loop1_config
    assert c.V == 1.0
    assert c.WHEELBASE == 1.0
    assert c.MAX_RANGE == 10.0
    assert c.SWITCH_HEADING_KNOWN == 1


def test_q_r_inflation():
    c = SlamConfig(SWITCH_INFLATE_NOISE=1)
    assert math.isclose(c.Q[0], 2 * 0.3**2)
    # Qe/Re stay uninflated (slamwrapper.cpp:31-37 semantics, bug fixed).
    assert math.isclose(c.Qe[0], 0.3**2)


def test_cli_overrides():
    ov = apply_cli_overrides(["-SWITCH_HEADING_KNOWN", "0", "-NPARTICLES", "500"])
    c = SlamConfig.from_mapping(ov)
    assert c.SWITCH_HEADING_KNOWN == 0
    assert c.NPARTICLES == 500
