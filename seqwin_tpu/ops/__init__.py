"""Numeric primitives: ntHash constants, scalar reference ops, test oracle."""
