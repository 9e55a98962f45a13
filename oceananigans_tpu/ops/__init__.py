from oceananigans_tpu.ops.operators import (
    shift,
    dx_f, dx_c, dy_f, dy_c, dz_f, dz_c,
    ix_f, ix_c, iy_f, iy_c, iz_f, iz_c,
    ddx_c, ddx_f, ddy_c, ddy_f, ddz_c, ddz_f,
    divergence_ccc, div_xy_cc,
    vorticity_z_ff,
    laplacian_ccc,
    kinetic_energy_cc,
)
