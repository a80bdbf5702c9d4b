from .physics import Particles, StepResult
