"""L-system / turtle / curve tests (reference LSystem/LRule/Turtle/Curve,
SURVEY.md §2g)."""

import numpy as np

from mc_path_tracer_tpu.models.procedural import (
    LRule,
    LSystem,
    Turtle,
    bezier_eval,
    parse_modules,
    subdiv_open,
    tube_mesh,
)


def test_parse_modules_with_params():
    mods = parse_modules("F(1.5)[+F]A(1,2)")
    assert [m.symbol for m in mods] == ["F", "[", "+", "F", "]", "A"]
    assert mods[0].params == (1.5,)
    assert mods[5].params == (1.0, 2.0)


def test_algae_d0l_system():
    # Lindenmayer's classic: A -> AB, B -> A
    ls = LSystem().set_axiom("A").add_rule("A -> AB").add_rule("B -> A")
    out = "".join(m.symbol for m in ls.build(5))
    assert out == "ABAABABAABAAB"  # generation 5


def test_parametric_rule_with_condition():
    ls = (
        LSystem()
        .set_axiom("A(2)")
        .add_rule("A(x) : x > 1 -> F(x)A(x/2)")
        .add_rule("A(x) : x <= 1 -> F(x)")
    )
    out = ls.build(3)
    s = "".join(m.symbol for m in out)
    assert s == "FF"  # A(2) -> F(2)A(1) -> F(2)F(1) -> fixed point
    fs = [m for m in out if m.symbol == "F"]
    assert fs[0].params == (2.0,)
    assert fs[1].params == (1.0,)


def test_stochastic_rule_reproducible():
    ls1 = LSystem(seed=7).set_axiom("F").add_rule("F -> F[+F] : 0.5").add_rule("F -> F[-F] : 1.0")
    ls2 = LSystem(seed=7).set_axiom("F").add_rule("F -> F[+F] : 0.5").add_rule("F -> F[-F] : 1.0")
    assert str_of(ls1.build(4)) == str_of(ls2.build(4))


def str_of(mods):
    return "".join(str(m) for m in mods)


def test_context_sensitive_rule():
    ls = (
        LSystem()
        .set_axiom("BAA")
        .add_rule("B < A -> B")   # A becomes B only right of a B
        .add_rule("B -> A")
    )
    out = "".join(m.symbol for m in ls.build(1))
    assert out == "ABA"


def test_turtle_square_closes():
    t = Turtle(step=1.0, angle=90.0)
    t.interpret("F+F+F+F")
    assert len(t.segments) == 4
    end = t.segments[-1][1]
    np.testing.assert_allclose(end, [0, 0, 0], atol=1e-6)


def test_turtle_push_pop():
    t = Turtle(step=1.0, angle=90.0)
    t.interpret("F[+F]F")
    # after pop, third segment continues straight up from (0,1,0)
    np.testing.assert_allclose(t.segments[2][0], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(t.segments[2][1], [0, 2, 0], atol=1e-6)


def test_turtle_mesh_is_renderable():
    from mc_path_tracer_tpu.models.scene import Scene

    t = Turtle(step=0.5, angle=25.0)
    sys = LSystem(seed=1).set_axiom("F").add_rule("F -> F[+F]F[-F]F")
    t.interpret(sys.build(2))
    p, n, uv, idx = t.to_mesh(sides=5)
    assert len(p) > 0 and len(idx) > 0
    s = Scene()
    m = s.add_material(albedo=(0.3, 0.6, 0.2))
    s.add_mesh(p, idx, normals=n, uvs=uv, material_id=m)
    sd = s.build()
    assert sd.tris.num_triangles == len(idx)


def test_bezier_endpoints_and_midpoint():
    ctrl = np.array([[0, 0, 0], [0, 1, 0], [1, 1, 0], [1, 0, 0]], np.float64)
    t = np.array([0.0, 0.5, 1.0])
    pts = bezier_eval(ctrl, t)
    np.testing.assert_allclose(pts[0], ctrl[0], atol=1e-12)
    np.testing.assert_allclose(pts[2], ctrl[3], atol=1e-12)
    np.testing.assert_allclose(pts[1], [0.5, 0.75, 0.0], atol=1e-12)


def test_subdiv_open_keeps_endpoints_and_refines():
    pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0]], np.float32)
    out = subdiv_open(pts, iterations=2)
    np.testing.assert_allclose(out[0], pts[0], atol=1e-6)
    np.testing.assert_allclose(out[-1], pts[-1], atol=1e-6)
    assert len(out) > len(pts)


def test_tube_mesh_shape():
    line = np.array([[0, 0, 0], [0, 1, 0], [0, 2, 0]], np.float32)
    p, n, uv, idx = tube_mesh(line, radius=0.1, sides=8)
    assert p.shape[0] == 2 * 8 * 2  # 2 segments x 8 sides x 2 rings
    assert idx.shape[0] == 2 * 8 * 2
