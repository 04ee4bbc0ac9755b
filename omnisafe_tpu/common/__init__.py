"""Common components: buffers, logger, Lagrange multipliers, normalizer
(reference layer: omnisafe/common/**)."""
