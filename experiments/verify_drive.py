"""End-to-end verification drive (per .claude/skills/verify): ball drop & rest,
pendulum joint, overflow probe, determinism — through the public API on CPU."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["BEPUPHYSICS2_TPU_NO_CACHE"] = "1"
os.environ["BEPUPHYSICS2_TPU_RUN_CHUNK"] = "0"
sys.path.insert(0, "/root/repo")
import numpy as np
from bepuphysics2_tpu import (Simulation, SimConfig, Sphere, Box,
                              BodyDescription, StaticDescription)

CFG = SimConfig(body_capacity=64, max_pairs=256, substeps=4, num_colors=4)

# 1. Ball drop & rest
sim = Simulation(CFG)
ground = sim.add_shape(Box(50., .5, 50.))
s = Sphere(.5); ss = sim.add_shape(s)
sim.add_static(StaticDescription(position=(0, -.5, 0), shape=ground))
ball = sim.add_body(BodyDescription.dynamic((0, 2., 0), ss, 1., s))
sim.run(120, 1/60.)
pos, orn, vel, omega = sim.get_body(ball)
assert abs(pos[1] - 0.5) < 0.01, f"rest height {pos[1]}"
assert np.linalg.norm(vel) < 0.02, f"rest vel {vel}"
print("1. ball drop & rest OK:", pos[1], np.linalg.norm(vel))

# 2. Pendulum: rod length holds
sim2 = Simulation(CFG)
anchor = sim2.add_body(BodyDescription.kinematic((0, 3., 0)))
bob = sim2.add_body(BodyDescription.dynamic((1., 3., 0), ss, 1., s))
sim2.add_constraint("ball_socket", [anchor, bob],
                    local_offset_a=(0, 0, 0), local_offset_b=(-1., 0, 0))
sim2.run(90, 1/60.)
p, _, _, _ = sim2.get_body(bob)
rod = np.linalg.norm(p - np.array([0, 3., 0]))
assert abs(rod - 1.0) < 0.05, f"rod length {rod}"
print("2. pendulum OK: rod =", rod)

# 3. Overflow probe (tiny max_pairs) — same config shape family but distinct config
simo = Simulation(SimConfig(body_capacity=64, max_pairs=2, substeps=4, num_colors=4))
g2 = simo.add_shape(Box(50., .5, 50.))
so = simo.add_shape(s)
simo.add_static(StaticDescription(position=(0, -.5, 0), shape=g2))
for i in range(6):
    simo.add_body(BodyDescription.dynamic((i * 0.6, 0.6, 0), so, 1., s))
simo.run(30, 1/60.)
assert bool(np.asarray(simo.last_diag.overflow)), "overflow should be detected"
print("3. overflow probe OK")

# 4. Determinism: identical scene twice → bit-identical positions
def build_and_run():
    sd = Simulation(CFG)
    gg = sd.add_shape(Box(50., .5, 50.))
    sss = sd.add_shape(s)
    sd.add_static(StaticDescription(position=(0, -.5, 0), shape=gg))
    rng = np.random.default_rng(3)
    for i in range(12):
        p0 = (rng.uniform(-1, 1), 0.7 + 0.8 * i, rng.uniform(-1, 1))
        sd.add_body(BodyDescription.dynamic(p0, sss, 1., s))
    sd.run(60, 1/60.)
    sd._sync_from_device()
    return np.stack([sd._host.px, sd._host.py, sd._host.pz])

r1 = build_and_run()
r2 = build_and_run()
assert np.array_equal(r1, r2), "nondeterministic trajectories"
print("4. determinism OK")
print("VERIFY DRIVE PASSED")
