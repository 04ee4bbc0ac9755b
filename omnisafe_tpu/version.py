"""Version info (reference: omnisafe/version.py:17-51)."""

__version__ = '0.1.0'
