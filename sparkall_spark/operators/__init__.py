"""Large-scale training-data pipeline operators (beyond reference parity).

Every operator is a plain ``DataFrame -> DataFrame`` function so it
composes with the engine's output and inherits Catalyst planning.
"""
