"""Model/prefab layer: capability proofs built ON TOP of the public API (the reference's
Demos extensions, SURVEY §2.8 — ragdolls, cloth, cars, characters)."""
from .ragdoll import add_ragdoll
from .cloth import add_cloth
from .vehicle import SimpleCar
from .character import Character
from .tank import Tank

__all__ = ["add_ragdoll", "add_cloth", "SimpleCar", "Character", "Tank"]
