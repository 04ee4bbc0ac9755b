"""Utility layer: math/solver kernels, distributions, config, schedules
(reference layer: omnisafe/utils/**)."""
