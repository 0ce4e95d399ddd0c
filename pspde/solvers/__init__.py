from .eigen import EigenSolver
from .elliptic import EllipticSolver
from .general import GeneralSolver
from .hjb import HJBSolver

# Reference-name alias (solver.py:18)
Solver = HJBSolver
