import numpy as np

from slam_tpu.maps import read_map_file, synthetic_map, write_map_file


def test_read_webmap(webmap_map):
    assert webmap_map.landmarks.shape == (35, 2)
    assert webmap_map.waypoints.shape == (17, 2)
    np.testing.assert_allclose(
        webmap_map.landmarks[0], [2.9922, -25.7009], rtol=1e-5)
    np.testing.assert_allclose(
        webmap_map.waypoints[0], [12.6495, -41.5888], rtol=1e-5)


def test_read_all_reference_maps():
    sizes = {
        "example_loop1": (22, 33),
        "example_loop2": (25, 30),
        "example_loop902": (117, 24),
        "example_webmap": (35, 17),
    }
    for name, (n_lm, n_wp) in sizes.items():
        m = read_map_file(f"/root/reference/data/{name}.mat")
        assert m.n_landmarks == n_lm, name
        assert m.n_waypoints == n_wp, name


def test_roundtrip(tmp_path, webmap_map):
    p = tmp_path / "m.mat"
    write_map_file(str(p), webmap_map)
    m2 = read_map_file(str(p))
    np.testing.assert_allclose(m2.landmarks, webmap_map.landmarks, atol=1e-5)
    np.testing.assert_allclose(m2.waypoints, webmap_map.waypoints, atol=1e-5)


def test_synthetic_map():
    m = synthetic_map(10_000, n_waypoints=64, seed=3)
    assert m.landmarks.shape == (10_000, 2)
    assert m.waypoints.shape == (64, 2)
    ext = m.extent()
    assert ext[0] < ext[1] and ext[2] < ext[3]
