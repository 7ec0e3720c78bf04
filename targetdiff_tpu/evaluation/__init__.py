from . import analyze, eval_atom_type, eval_bond_length, scoring  # noqa: F401
