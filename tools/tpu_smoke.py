"""TPU-vs-CPU correctness smoke harness.

The CPU test suite cannot catch TPU-backend-specific miscompilations
(e.g. the composed FFT chain that returned periodic modes at half
amplitude). This script runs short versions of the main model paths on
the DEFAULT backend and writes/compares field snapshots against a CPU
reference:

    python tools/tpu_smoke.py generate     # on CPU: write references
    python tools/tpu_smoke.py check        # on TPU: compare

All comparisons are float32-roundoff-level (atol listed per case).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

OUT = "/tmp/tpu_smoke"


def _cases():
    import jax
    import jax.numpy as jnp

    from oceananigans_tpu import (
        Bounded, BuoyancyTracer, Periodic, RectilinearGrid,
    )
    from oceananigans_tpu.advection import WENO
    from oceananigans_tpu.models import (
        HydrostaticFreeSurfaceModel, NonhydrostaticModel,
    )
    from oceananigans_tpu.models.hydrostatic import ImplicitFreeSurface

    def nonhydro():
        grid = RectilinearGrid(size=(64, 64, 64), extent=(1.0, 1.0, 1.0),
                               topology=(Bounded, Periodic, Periodic),
                               halo=(1, 0, 0), dtype="float32")
        model = NonhydrostaticModel(grid=grid,
                                    timestepper="QuasiAdamsBashforth2")
        state = model.initial_state(
            v=lambda x, y, z: 0.1 * jnp.sin(4 * np.pi * x)
            * jnp.cos(2 * np.pi * y) * jnp.cos(2 * np.pi * z))
        step = jax.jit(lambda s: model.step(s, jnp.float32(1e-3)))
        s = state
        for _ in range(20):
            s = step(s)
        s = jax.block_until_ready(s)
        return {"u": np.asarray(s.u), "w": np.asarray(s.w)}

    def nonhydro_weno():
        grid = RectilinearGrid(size=(48, 48, 48), extent=(1.0, 1.0, 1.0),
                               topology=(Bounded, Periodic, Periodic),
                               halo=(3, 0, 0), dtype="float32")
        model = NonhydrostaticModel(grid=grid, advection=WENO(5),
                                    tracers=("b",),
                                    buoyancy=BuoyancyTracer())
        state = model.initial_state(
            u=lambda x, y, z: 0.1 * jnp.sin(2 * np.pi * y)
            * jnp.cos(2 * np.pi * z),
            b=lambda x, y, z: 0.01 * jnp.cos(2 * np.pi * x))
        step = jax.jit(lambda s: model.step(s, jnp.float32(2e-3)))
        s = state
        for _ in range(10):
            s = step(s)
        s = jax.block_until_ready(s)
        return {"u": np.asarray(s.u), "b": np.asarray(s.tracers["b"])}

    def hydro_implicit():
        grid = RectilinearGrid(size=(48, 24, 4), x=(0, 1e5), y=(0, 5e4),
                               z=(-100, 0),
                               topology=(Periodic, Bounded, Bounded),
                               halo=3, dtype="float32")
        model = HydrostaticFreeSurfaceModel(
            grid=grid,
            free_surface=ImplicitFreeSurface(solver_method="fft"))
        state = model.initial_state(
            eta=lambda x, y: 0.1 * np.sin(2 * np.pi * x / 1e5)
            * np.cos(np.pi * y / 5e4))
        step = jax.jit(lambda s: model.step(s, jnp.float32(50.0)))
        s = state
        for _ in range(20):
            s = step(s)
        s = jax.block_until_ready(s)
        return {"eta": np.asarray(s.eta), "u": np.asarray(s.u)}

    def cubed_sphere():
        from oceananigans_tpu.grids.cubed_sphere_grid import (
            ConformalCubedSphereGrid,
        )
        from oceananigans_tpu.models.cubed_sphere import (
            CubedSphereShallowWaterModel, panel_vector_components,
        )
        a = 6.37122e6
        u0 = 2 * np.pi * a / (12 * 86400)
        grid = ConformalCubedSphereGrid((16, 1), z=(-1.0, 0.0), radius=a,
                                        halo=3)
        model = CubedSphereShallowWaterModel(grid)
        u, v = panel_vector_components(
            grid, lambda P: np.cross(np.array([0.0, 0.0, u0 / a]),
                                     P * a))
        state = model.initial_state(u=u, v=v, h=3000.0)
        step = jax.jit(lambda s: model.step(s, jnp.float32(300.0)))
        s = state
        for _ in range(10):
            s = step(s)
        s = jax.block_until_ready(s)
        return {"h": np.asarray(s.h), "u": np.asarray(s.u)}

    def tripolar():
        from oceananigans_tpu.grids.orthogonal import TripolarGrid
        from oceananigans_tpu.models.hydrostatic import (
            ExplicitFreeSurface,
        )
        grid = TripolarGrid(size=(32, 16, 3),
                            southernmost_latitude=-75.0,
                            z=(-1000.0, 0.0), halo=2, dtype="float32")
        model = HydrostaticFreeSurfaceModel(
            grid=grid, free_surface=ExplicitFreeSurface(),
            tracers=("c",))
        state = model.initial_state(
            c=lambda lam, phi, z: np.cos(np.deg2rad(phi)) + 0 * lam,
            eta=lambda lam, phi: 0.1 * np.sin(np.deg2rad(lam)))
        step = jax.jit(lambda s: model.step(s, jnp.float32(60.0)))
        s = state
        for _ in range(10):
            s = step(s)
        s = jax.block_until_ready(s)
        return {"eta": np.asarray(s.eta),
                "c": np.asarray(s.tracers["c"])}

    def immersed():
        from oceananigans_tpu.immersed import (
            GridFittedBottom, ImmersedBoundaryGrid,
        )
        base = RectilinearGrid(size=(32, 1, 16), x=(0.0, 2.0),
                               y=(0.0, 1.0), z=(-1.0, 0.0),
                               topology=(Periodic, Periodic, Bounded),
                               halo=2, dtype="float32")
        grid = ImmersedBoundaryGrid(
            base, GridFittedBottom(
                lambda x, y: -1.0 + 0.4 * np.exp(-((x - 1) / 0.3) ** 2)))
        model = NonhydrostaticModel(grid=grid)
        state = model.initial_state(u=lambda x, y, z: 0.1 + 0 * x)
        step = jax.jit(lambda s: model.step(s, jnp.float32(5e-3)))
        s = state
        for _ in range(10):
            s = step(s)
        s = jax.block_until_ready(s)
        return {"u": np.asarray(s.u), "w": np.asarray(s.w)}

    def hydro_vi():
        """WENOVectorInvariant on a lat-lon grid: on TPU the fused
        ops/pallas_vi kernel auto-engages; compares against the CPU XLA
        path."""
        from oceananigans_tpu import LatitudeLongitudeGrid
        from oceananigans_tpu.models.hydrostatic import (
            ExplicitFreeSurface, WENOVectorInvariant,
        )
        grid = LatitudeLongitudeGrid(size=(48, 32, 8),
                                     longitude=(-30.0, 30.0),
                                     latitude=(15.0, 55.0),
                                     z=(-1000.0, 0.0), halo=6,
                                     dtype="float32")
        # force the VI kernel on chip (the auto gate rightly refuses this
        # nz-thin grid's 20->128 lane padding; the smoke's job is to
        # validate the KERNEL against the CPU XLA reference, not the
        # gate policy)
        on_tpu = jax.default_backend() != "cpu"
        model = HydrostaticFreeSurfaceModel(
            grid=grid, momentum_advection=WENOVectorInvariant(),
            free_surface=ExplicitFreeSurface(),
            fused_kernels=True if on_tpu else "auto")
        if on_tpu:
            assert model.fused_kernels, "pallas_vi kernel did not engage"
        state = model.initial_state(
            u=lambda lam, phi, z: 0.5 * np.cos(np.deg2rad(phi))
            + 0 * lam,
            eta=lambda lam, phi: 0.05 * np.sin(np.deg2rad(lam) * 6))
        step = jax.jit(lambda s: model.step(s, jnp.float32(30.0)))
        s = state
        for _ in range(10):
            s = step(s)
        s = jax.block_until_ready(s)
        return {"u": np.asarray(s.u), "v": np.asarray(s.v),
                "eta": np.asarray(s.eta)}

    def tracer_weno7():
        """WENO(7) multi-tracer advection: on TPU the generic-order
        fused ops/pallas_tracer kernel auto-engages."""
        grid = RectilinearGrid(size=(48, 48, 48), extent=(1.0, 1.0, 1.0),
                               topology=(Bounded, Periodic, Periodic),
                               halo=(4, 4, 4), dtype="float32")
        model = NonhydrostaticModel(grid=grid, advection=WENO(7),
                                    tracers=("a", "b"),
                                    timestepper="QuasiAdamsBashforth2")
        if jax.default_backend() != "cpu":
            assert model.fused_tracer, "pallas_tracer kernel did not engage"
        state = model.initial_state(
            v=lambda x, y, z: 0.2 * jnp.sin(2 * np.pi * x),
            a=lambda x, y, z: jnp.cos(2 * np.pi * y) * z,
            b=lambda x, y, z: jnp.sin(2 * np.pi * z))
        step = jax.jit(lambda s: model.step(s, jnp.float32(2e-3)))
        s = state
        for _ in range(10):
            s = step(s)
        s = jax.block_until_ready(s)
        return {"a": np.asarray(s.tracers["a"]),
                "b": np.asarray(s.tracers["b"])}

    def hydro_vi_zyx():
        """nz-thin realistic layout: the TRANSPOSED (z, y, x) VI +
        tracer kernels auto-engage on TPU (round-5 lane-major
        relayout); compares against the CPU XLA path."""
        from oceananigans_tpu.models.hydrostatic import (
            SplitExplicitFreeSurface, WENOVectorInvariant,
        )
        from oceananigans_tpu.ops.pallas_vi import (
            vi_transposed_layout_preferred,
        )
        grid = RectilinearGrid(size=(244, 48, 12),
                               extent=(4e6, 1e6, 2e3),
                               topology=(Periodic, Bounded, Bounded),
                               halo=(6, 6, 4), dtype="float32")
        vi = WENOVectorInvariant()
        assert vi_transposed_layout_preferred(grid, vi)
        model = HydrostaticFreeSurfaceModel(
            grid=grid, momentum_advection=vi,
            tracer_advection=WENO(7), tracers=("T",),
            free_surface=SplitExplicitFreeSurface(substeps=8))
        if jax.default_backend() != "cpu":
            assert model.fused_kernels, "zyx VI kernel did not engage"
            assert model.fused_tracer, "zyx tracer kernel did not engage"
        state = model.initial_state(
            u=lambda x, y, z: 0.3 * jnp.sin(2 * np.pi * x / 4e6),
            T=lambda x, y, z: 20.0 + 8e-4 * z)
        step = jax.jit(lambda s: model.step(s, jnp.float32(60.0)))
        s = state
        for _ in range(10):
            s = step(s)
        s = jax.block_until_ready(s)
        return {"u": np.asarray(s.u), "v": np.asarray(s.v),
                "T": np.asarray(s.tracers["T"]),
                "eta": np.asarray(s.eta)}

    return {"nonhydro": (nonhydro, 5e-6),
            "hydro_vi_zyx": (hydro_vi_zyx, 5e-4),
            "nonhydro_weno": (nonhydro_weno, 5e-6),
            "hydro_implicit": (hydro_implicit, 5e-5),
            "hydro_vi": (hydro_vi, 5e-4),   # u ~ 0.5 m/s scale
            "tracer_weno7": (tracer_weno7, 5e-6),
            "cubed_sphere": (cubed_sphere, 5e-2),   # h ~ 3000 m scale
            "tripolar": (tripolar, 5e-5),
            "immersed": (immersed, 5e-5)}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode not in ("check", "generate"):      # bare case name(s)
        mode, only = "check", sys.argv[1:]
    else:
        only = sys.argv[2:]
    if mode == "generate":
        import jax
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(OUT, exist_ok=True)
    cases = _cases()
    if only:
        unknown = [n for n in only if n not in cases]
        if unknown:
            sys.exit(f"unknown smoke case(s) {unknown}; "
                     f"have {sorted(cases)}")
        cases = {n: cases[n] for n in only}
    failed = []
    for name, (fn, atol) in cases.items():
        out = fn()
        path = os.path.join(OUT, f"{name}.npz")
        if mode == "generate":
            np.savez_compressed(path, **out)
            print(f"[generate] {name}: wrote {path}", flush=True)
            continue
        with np.load(path) as ref:
            for field in ref.files:
                d = np.abs(out[field].astype(np.float64)
                           - ref[field].astype(np.float64)).max()
                ok = bool(d <= atol)          # NaN-safe: NaN fails
                status = "OK " if ok else "FAIL"
                if not ok:
                    failed.append((name, field, d))
                print(f"[check] {name}/{field}: max|diff| {d:.3e} "
                      f"(atol {atol:g}) {status}", flush=True)
    if failed:
        sys.exit(f"TPU smoke FAILURES: {failed}")
    if mode == "check":
        print("TPU smoke: all cases match CPU references")


if __name__ == "__main__":
    main()
