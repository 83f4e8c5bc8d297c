"""The violent poly crash (10 cm fall onto large spheres) on the CPU
backend: does energy grow there too? Distinguishes an integration-
stability issue (both backends) from a TPU-path bug (TPU only)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from dem_engine_tpu.api import DEMSolver

rng = np.random.default_rng(7)
s = DEMSolver()
s.InstructBoxDomainDimension(0.5, 0.5, 6.0)
mat = s.LoadMaterial({"E": 1e7, "nu": 0.3, "CoR": 0.3, "mu": 0.5,
                      "Crr": 0.3})
r, rho = 0.01, 2.6e3
t_s = s.LoadSphereType(rho * 4/3*np.pi*r**3, r, mat)
grid = np.stack(np.meshgrid(np.arange(10), np.arange(10), np.arange(3),
                indexing="ij"), axis=-1).reshape(-1, 3)
pos = 0.1 + grid * [0.021, 0.021, 0.021]
pos[:, 2] += 0.012   # the buggy 10 cm-fall geometry, on purpose
s.AddClumps(t_s, pos)
rl = 3 * r
t_l = s.LoadSphereType(rho * 4/3*np.pi*rl**3, rl, mat)
pos_l = np.asarray([[0.14 + 0.07*i, 0.14 + 0.07*j, 0.107]
                    for i in range(3) for j in range(3)])
s.AddClumps(t_l, pos_l)
s.AddBCPlane([0.25, 0.25, 0.0], [0, 0, 1], mat)
s.SetInitTimeStep(5e-6)
s.SetGravitationalAcceleration([0, 0, -9.81])
s.SetCDUpdateFreq(20)
s.Initialize()
print("two_class:", s.engine.cfg.cd_two_class,
      "fused:", s.engine.cfg.use_fused_force, flush=True)
n = 309
masses = np.asarray([rho*4/3*np.pi*r**3]*300 + [rho*4/3*np.pi*rl**3]*9)
for w in range(5):
    s.DoDynamics(0.03)
    p = np.asarray(s.GetOwnerPosition())[:n]
    v = np.asarray(s.GetOwnerVelocity())[:n]
    ke = 0.5*np.sum(masses*np.sum(v*v, axis=1))
    pe = 9.81*np.sum(masses*p[:, 2])
    print(f"t={s.GetTime():.3f} E={ke+pe:.3f} KE={ke:.3f} "
          f"zmax={p[:,2].max():.3f} vmax={np.abs(v).max():.2f}",
          flush=True)
