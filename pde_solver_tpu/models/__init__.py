"""PDE model families: heat (parabolic) and linear elasticity (elliptic)."""
