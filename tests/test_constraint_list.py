"""ConstraintList tests — mirrors test/constraint_list.jl: ordering,
insertion, per-knot counts, dimension checking."""
import numpy as np
import pytest

from trajopt_tpu.constraint_list import ConstraintList
from trajopt_tpu.constraints import (
    BoundConstraint, CircleConstraint, GoalConstraint, NormConstraint,
)
from trajopt_tpu.cones import Cone


def _cons(n=4, m=2, N=11):
    cl = ConstraintList(n, m, N)
    goal = GoalConstraint.create(np.ones(n), m=m)
    circ = CircleConstraint.create(n, [0.0], [1.0], [0.5], m=m)
    bnd = BoundConstraint.create(n, m, u_min=-1, u_max=1)
    return cl, goal, circ, bnd


def test_add_and_iterate():
    cl, goal, circ, bnd = _cons()
    cl.add_constraint(goal, 10)
    cl.add_constraint(circ, range(1, 10))
    cl.add_constraint(bnd, range(10))
    assert len(cl) == 3
    assert cl[0] is goal and cl[1] is circ and cl[2] is bnd
    pairs = list(cl.zip())
    assert pairs[0][0] == (10,)
    assert pairs[1][0] == tuple(range(1, 10))
    # insertion at index (constraint_list.jl:103-134)
    cl2, goal2, *_ = _cons()
    cl2.add_constraint(goal2, 10)
    cl2.add_constraint(circ, range(1, 10), idx=0)
    assert cl2[0] is circ


def test_num_constraints():
    # constraint_list.jl:42,198-206
    cl, goal, circ, bnd = _cons()
    cl.add_constraint(goal, 10)
    cl.add_constraint(circ, range(1, 10))
    cl.add_constraint(bnd, range(10))
    p = cl.num_constraints()
    assert p[0] == bnd.output_dim
    assert p[1] == circ.output_dim + bnd.output_dim
    assert p[10] == goal.output_dim
    assert cl.constraintindices(0) == [2]
    assert cl.constraintindices(5) == [1, 2]


def test_dim_and_terminal_checks():
    cl, goal, circ, bnd = _cons()
    # control constraint at terminal knot rejected
    with pytest.raises(ValueError):
        cl.add_constraint(bnd, range(11))
    # bad knot index
    with pytest.raises(ValueError):
        cl.add_constraint(goal, 11)
    # wrong state dim
    bad = GoalConstraint.create(np.ones(5), m=2)
    with pytest.raises(ValueError):
        cl.add_constraint(bad, 10)


def test_senses():
    cl, goal, circ, bnd = _cons()
    soc = NormConstraint.create(4, 2, 5.0, Cone.SECOND_ORDER, "control")
    cl.add_constraint(goal, 10)
    cl.add_constraint(circ, range(1, 10))
    cl.add_constraint(soc, range(10))
    cl.add_constraint(bnd, range(10))
    # quickstart.jl:121-122 parity
    assert cl.senses == [Cone.ZERO, Cone.NEGATIVE_ORTHANT, Cone.SECOND_ORDER,
                         Cone.NEGATIVE_ORTHANT]
