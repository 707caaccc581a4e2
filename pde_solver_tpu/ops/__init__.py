"""Numerical kernels: elements, assembly, stencil operators, CG, stepping."""
