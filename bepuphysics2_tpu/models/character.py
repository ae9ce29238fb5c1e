"""Character controller — the reference CharacterControllers equivalent
(Demos/Demos/Characters/CharacterControllers.cs:85): an angular-locked capsule driven by a
horizontal velocity motor with ground support detection.

The reference implements support detection through narrow-phase callbacks and a dedicated
1-contact motion constraint; here the same behavior is composed from public pieces:
- the capsule body has zero inverse angular inertia (never tips over);
- support is probed with a scene ray cast under the capsule;
- movement applies a one-body linear motor (max force limited: can't climb walls) whose
  target is the desired horizontal velocity, only while supported;
- jumps set vertical velocity directly.
"""
from __future__ import annotations

import numpy as np

from ..bodies import BodyDescription
from ..constraints.joints import MotorSettingsDesc
from ..shapes import Capsule


class Character:
    def __init__(self, sim, position=(0, 1.0, 0), radius=0.3, height=1.0, mass=1.0,
                 max_force=20.0):
        self.sim = sim
        self.shape_obj = Capsule(radius, height * 0.5)
        shape = sim.add_shape(self.shape_obj)
        self.radius = radius
        self.half_height = height * 0.5 + radius
        inv_mass = 1.0 / mass
        self.body = sim.add_body(
            BodyDescription(
                position=position, shape=shape, inv_mass=inv_mass,
                inv_inertia=(0.0,) * 6,  # angular locked: the character never tips
                friction=0.3, sleep_threshold=-1.0,
            )
        )
        self.max_force = max_force
        self._motor = sim.add_constraint(
            "one_body_linear_motor", [self.body],
            local_offset=(0, 0, 0), target_velocity=(0, 0, 0),
            motor=MotorSettingsDesc(maximum_force=0.0, softness=0.05),
        )

    def supported(self) -> bool:
        pos, _, _, _ = self.sim.get_body(self.body)
        hit = self.sim.ray_cast(
            pos, (0.0, -1.0, 0.0), self.half_height + 0.1, exclude=self.body
        )
        return bool(hit.hit)

    def move(self, target_velocity_xz, jump_speed: float = 0.0):
        """Call per control tick: sets the horizontal velocity target; optionally jumps."""
        supported = self.supported()
        pos, _, vel, _ = self.sim.get_body(self.body)
        tx, tz = target_velocity_xz
        jumping = jump_speed > 0.0 and supported
        # The motor is a 3-DOF velocity servo; its vertical target would fight gravity
        # mid-flight (the reference's CharacterMotionConstraint is tangent-plane-only,
        # CharacterMotionConstraint.cs). On a jump tick, disable it for ballistic flight —
        # the next move() call re-engages it.
        force = 0.0 if jumping else (self.max_force if supported else self.max_force * 0.1)
        self.sim.update_constraint(
            self._motor,
            local_offset=(0, 0, 0),
            target_velocity=(float(tx), float(vel[1]), float(tz)),
            motor=MotorSettingsDesc(maximum_force=force, softness=0.05),
        )
        if jumping:
            self.sim.set_velocity(self.body, linear=(vel[0], jump_speed, vel[2]))
