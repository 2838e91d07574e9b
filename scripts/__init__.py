"""Repo maintenance scripts (rotation planning, plan audit, stress
runs). A package so tests can import them directly."""
