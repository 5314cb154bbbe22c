"""Operator-string DSL -> dense matrices.

The reference passes operator expressions as strings to the external ACE
binary via parameter files (e.g. ``add_Hamiltonian { -4*|3><3|_4 }``,
``boson_op = "1*(|1><1|_4 + |2><2|_4) + 2*|3><3|_4"``,
``"-i*0.028*(|2><1|_6 - |1><2|_6)"``, ``"sqrt(2)*|1><4|_18"``,
``"Id_2 otimes n_3"``; vocabulary written at
/root/reference/pyaceqd/general_system/general_system.py:227-290).

Here the same strings are parsed once, in-process, into dense complex
matrices.  Grammar (recursive descent):

    expr   := term (('+'|'-') term)*
    term   := factor (('*'|'otimes') factor)*      # left-assoc, same precedence
    factor := ('+'|'-') factor | atom
    atom   := NUMBER | 'pi' | 'hbar' | 'i' | 'sqrt' '(' expr ')'
            | PROJ | 'Id_d' | 'n_d' | 'b_d' | 'bdagger_d' | '(' expr ')'

Atoms:
- ``|n><m|_d``  : d-dimensional matrix with a single 1 at [n, m]
- ``Id_d``      : identity
- ``n_d``       : boson number operator diag(0..d-1)
- ``b_d`` / ``bdagger_d`` : truncated annihilation / creation operators
- ``i``         : the imaginary unit;  ``pi``, ``hbar`` : constants

Semantics: ``*`` is scalar multiplication or matrix product (dims must match);
``otimes`` is the Kronecker product.  Values are NumPy complex128; subsystem
dimensions are tracked through ``otimes`` so composite structure is available
to callers (e.g. compose_dm, partial traces).
"""

import re
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from pyaceqd_tpu import constants

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<proj>\|\d+><\d+\|_\d+)
      | (?P<ident>Id_\d+|bdagger_\d+|b_\d+|n_\d+)
      | (?P<func>sqrt)
      | (?P<const>pi|hbar|i)(?![A-Za-z_0-9])
      | (?P<number>\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)
      | (?P<op>otimes|[+\-*()])
    )""",
    re.VERBOSE,
)


@dataclass
class _Val:
    """Either a complex scalar or a matrix with subsystem dims."""
    scalar: Optional[complex] = None
    matrix: Optional[np.ndarray] = None
    dims: Optional[Tuple[int, ...]] = None

    @property
    def is_scalar(self):
        return self.matrix is None


def _tokenize(s):
    pos = 0
    tokens = []
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"Cannot tokenize operator string at: {s[pos:]!r}")
        pos = m.end()
        kind = m.lastgroup
        tokens.append((kind, m.group(kind)))
    tokens.append(("end", ""))
    return tokens


def _atom_matrix(tok: str) -> _Val:
    if tok.startswith("|"):
        m = re.match(r"\|(\d+)><(\d+)\|_(\d+)", tok)
        n, mm, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
        if n >= d or mm >= d:
            raise ValueError(f"Index out of bounds in {tok}")
        mat = np.zeros((d, d), dtype=np.complex128)
        mat[n, mm] = 1.0
        return _Val(matrix=mat, dims=(d,))
    name, d = tok.rsplit("_", 1)
    d = int(d)
    if name == "Id":
        return _Val(matrix=np.eye(d, dtype=np.complex128), dims=(d,))
    if name == "n":
        return _Val(matrix=np.diag(np.arange(d)).astype(np.complex128), dims=(d,))
    if name == "b":
        mat = np.diag(np.sqrt(np.arange(1, d)).astype(np.complex128), k=1)
        return _Val(matrix=mat, dims=(d,))
    if name == "bdagger":
        mat = np.diag(np.sqrt(np.arange(1, d)).astype(np.complex128), k=-1)
        return _Val(matrix=mat, dims=(d,))
    raise ValueError(f"Unknown operator atom: {tok}")


class _Parser:
    def __init__(self, s):
        self.s = s
        self.toks = _tokenize(s)
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val):
        kind, tok = self.next()
        if tok != val:
            raise ValueError(f"Expected {val!r}, got {tok!r} in {self.s!r}")

    def parse(self) -> _Val:
        v = self.expr()
        if self.peek()[0] != "end":
            raise ValueError(f"Trailing tokens in operator string {self.s!r}: {self.toks[self.i:]}")
        return v

    def expr(self) -> _Val:
        v = self.term()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            rhs = self.term()
            v = self._add(v, rhs, -1 if op == "-" else 1)
        return v

    def term(self) -> _Val:
        v = self.factor()
        while self.peek()[1] in ("*", "otimes"):
            op = self.next()[1]
            rhs = self.factor()
            v = self._kron(v, rhs) if op == "otimes" else self._mul(v, rhs)
        return v

    def factor(self) -> _Val:
        kind, tok = self.peek()
        if tok in ("+", "-"):
            self.next()
            v = self.factor()
            if tok == "-":
                if v.is_scalar:
                    return _Val(scalar=-v.scalar)
                return _Val(matrix=-v.matrix, dims=v.dims)
            return v
        return self.atom()

    def atom(self) -> _Val:
        kind, tok = self.next()
        if kind == "number":
            return _Val(scalar=complex(float(tok)))
        if kind == "const":
            return _Val(scalar={"pi": complex(np.pi), "hbar": complex(constants.hbar), "i": 1j}[tok])
        if kind == "func":  # sqrt
            self.expect("(")
            v = self.expr()
            self.expect(")")
            if not v.is_scalar:
                raise ValueError("sqrt() of a matrix is not supported")
            return _Val(scalar=complex(np.sqrt(v.scalar)))
        if kind == "proj" or kind == "ident":
            return _atom_matrix(tok)
        if tok == "(":
            v = self.expr()
            self.expect(")")
            return v
        raise ValueError(f"Unexpected token {tok!r} in operator string {self.s!r}")

    @staticmethod
    def _add(a: _Val, b: _Val, sign: int) -> _Val:
        if a.is_scalar and b.is_scalar:
            return _Val(scalar=a.scalar + sign * b.scalar)
        if a.is_scalar or b.is_scalar:
            raise ValueError("Cannot add a scalar and a matrix")
        if a.matrix.shape != b.matrix.shape:
            raise ValueError(f"Dimension mismatch in '+': {a.matrix.shape} vs {b.matrix.shape}")
        dims = a.dims if a.dims == b.dims else (a.matrix.shape[0],)
        return _Val(matrix=a.matrix + sign * b.matrix, dims=dims)

    @staticmethod
    def _mul(a: _Val, b: _Val) -> _Val:
        if a.is_scalar and b.is_scalar:
            return _Val(scalar=a.scalar * b.scalar)
        if a.is_scalar:
            return _Val(matrix=a.scalar * b.matrix, dims=b.dims)
        if b.is_scalar:
            return _Val(matrix=b.scalar * a.matrix, dims=a.dims)
        if a.matrix.shape[1] != b.matrix.shape[0]:
            raise ValueError(f"Dimension mismatch in '*': {a.matrix.shape} vs {b.matrix.shape}")
        dims = a.dims if a.dims == b.dims else (a.matrix.shape[0],)
        return _Val(matrix=a.matrix @ b.matrix, dims=dims)

    @staticmethod
    def _kron(a: _Val, b: _Val) -> _Val:
        if a.is_scalar or b.is_scalar:
            # scalar otimes X degenerates to multiplication
            return _Parser._mul(a, b)
        return _Val(matrix=np.kron(a.matrix, b.matrix), dims=tuple(a.dims) + tuple(b.dims))


def parse_operator_with_dims(s: str):
    """Parse an operator string; return (matrix, subsystem_dims).

    A purely scalar expression returns (scalar*[[1]], (1,))."""
    v = _Parser(s).parse()
    if v.is_scalar:
        return np.array([[v.scalar]], dtype=np.complex128), (1,)
    return v.matrix, v.dims


def parse_operator(s: str) -> np.ndarray:
    """Parse an operator string into a dense complex128 matrix."""
    return parse_operator_with_dims(s)[0]
