from .rng import make_seeded_state, uniforms, utilhash  # noqa: F401
