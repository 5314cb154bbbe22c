"""Dressed-state analysis: instantaneous eigensystem of H(t), state
composition, and dressed-state occupations <psi|rho|psi>.

Functional parity with /root/reference/pyaceqd/general_system/general_dressed_states.py;
the eigen-decomposition itself is one batched jnp.linalg.eigh over the whole
grid (engine.propagator.dressed_eigh) instead of the external
``timedep_eigenstates`` binary.
"""

import colorsys

import numpy as np

from pyaceqd_tpu.tools import basis_states, compose_dm, output_ops_dm


def hex_to_rgba(hex_code):
    hex_code = hex_code.lstrip('#')
    if len(hex_code) == 6:
        hex_code += 'FF'
    v = int(hex_code, 16)
    return (v >> 24 & 255, v >> 16 & 255, v >> 8 & 255, v & 255)


def select_equally_spaced_colors(n):
    colors = []
    for hue in [i / n for i in range(n)]:
        rgb = colorsys.hls_to_rgb(hue, 0.5, 1.0)
        colors.append("#{:02X}{:02X}{:02X}".format(*[int(255 * c) for c in rgb]))
    return colors


def dressed_states(system, dim, t_start, t_end, *pulses, plot=True, t_lim=None,
                   e_lim=None, filename="dressed", firstonly=False, colors=None,
                   visible_states=None, return_eigenvectors=False, print_states=None,
                   no_pulse=False, **options):
    """Two passes: (1) full rho(t) via output_ops_dm, (2) eigen-run of H(t).

    (reference general_dressed_states.py:26-44)"""
    options["output_ops"] = output_ops_dm(dim)
    _, rho = compose_dm(system(t_start, t_end, *pulses, **options), dim=int(np.prod(dim)))
    options["dressedstates"] = True
    options["firstonly"] = firstonly
    if no_pulse:
        pulses = []
    data = system(t_start, t_end, *pulses, **options)
    if colors is None:
        colors = select_equally_spaced_colors(n=int(np.prod(dim)))
    return _dressed_states(dim=dim, data=data, rho=rho, colors=colors,
                           filename=filename, plot=plot, t_lim=t_lim, e_lim=e_lim,
                           visible_states=visible_states,
                           return_eigenvectors=return_eigenvectors,
                           print_states=print_states)


def _dressed_states(dim, data, rho, colors, filename, plot=False, t_lim=None,
                    e_lim=None, visible_states=None, return_eigenvectors=False,
                    print_states=None):
    _dim = int(np.prod(dim))
    t = data[0].real

    e_vectors = np.zeros((len(t), _dim, _dim), dtype=np.complex128)
    e_values = np.zeros((len(t), _dim))
    for i in range(_dim):
        e_values[:, i] = data[i + 1].real
    for i in range(_dim):
        for j in range(_dim):
            # row i of e_vectors[k] = components of the i-th eigenvector
            e_vectors[:, i, j] = data[_dim + 1 + i * _dim + j]

    # phase-fix: rotate each frame so the first component of the first
    # eigenvector is real-positive (reference general_dressed_states.py:73-79)
    for i in range(len(t)):
        angle = 0.0
        if np.imag(e_vectors[i, 0, 0]) != 0 or np.real(e_vectors[i, 0, 0]) < 0:
            angle = np.angle(e_vectors[i, 0, 0])
        e_vectors[i] = e_vectors[i] * np.exp(-1j * angle)

    if print_states is not None:
        i = int(np.argmin(np.abs(t - print_states)))
        header = basis_states(dim if isinstance(dim, list) else [dim])
        header.insert(0, "t:{:.2f}".format(t[i]))
        header.append("Energy")
        rows = []
        for j in range(_dim):
            row = ["ds" + str(j + 1)]
            row.extend(np.abs(e_vectors[i, j]) ** 2)
            row.append(e_values[i, j])
            rows.append(row)
        try:
            from tabulate import tabulate
            print(tabulate(rows, headers=header, floatfmt=".2f"))
        except ImportError:
            print(header)
            for row in rows:
                print(row)

    if len(colors) != _dim:
        print("Error: Number of colors does not match number of dressed states.")
        return

    r_array = np.array([hex_to_rgba(c)[0] / 255 for c in colors])
    g_array = np.array([hex_to_rgba(c)[1] / 255 for c in colors])
    b_array = np.array([hex_to_rgba(c)[2] / 255 for c in colors])
    a_array = np.zeros(_dim)
    a_array_gp = np.zeros(_dim)
    if visible_states is None:
        a_array = np.array([hex_to_rgba(c)[3] / 255 for c in colors])
        a_array_gp = 1 - a_array
    else:
        if np.max(visible_states) > _dim - 1:
            print("Error: Visible states out of bounds.")
            return
        a_array[list(visible_states)] = 1
        a_array_gp[list(visible_states)] = 0

    n_colors = np.empty([_dim, len(t)])
    s_colors = []
    weights = np.abs(e_vectors) ** 2  # (t, state, component)
    for i in range(_dim):
        frame_colors = []
        for j in range(len(t)):
            e = weights[j, i]
            r = int(np.clip(np.dot(r_array, e), 0, 1) * 255)
            g = int(np.clip(np.dot(g_array, e), 0, 1) * 255)
            b = int(np.clip(np.dot(b_array, e), 0, 1) * 255)
            a = int(np.clip(np.dot(a_array, e), 0, 1) * 255)
            agp = int(np.clip(np.dot(a_array_gp, e), 0, 1) * 255)
            n_colors[i, j] = 65536 * r + 256 * g + b + agp * 16777216
            frame_colors.append("#{:02x}{:02x}{:02x}{:02x}".format(r, g, b, a))
        s_colors.append(frame_colors)

    # dressed-state occupations <psi|rho|psi> (reference :156-165)
    ds_occ = np.einsum('tjk,tkl,tjl->tj', e_vectors, rho, e_vectors.conj()).real

    if plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        labels = basis_states(dim if isinstance(dim, list) else [dim])
        plt.clf(); plt.ylim(-0.1, 1.1)
        for i in range(_dim):
            plt.plot(t, rho[:, i, i].real, label=labels[i], color=colors[i][:7])
        if t_lim is not None:
            plt.xlim(*t_lim)
        plt.xlabel("t (ps)"); plt.ylabel("occupation"); plt.legend()
        plt.savefig(filename + "_rho.png"); plt.clf()
        for i in range(_dim):
            plt.scatter(t, e_values[:, i], c=s_colors[i])
            plt.plot(t, e_values[:, i], label="ds{}".format(i + 1))
        if t_lim is not None:
            plt.xlim(*t_lim)
        if e_lim is not None:
            plt.ylim(*e_lim)
        plt.legend(); plt.xlabel("t (ps)"); plt.ylabel("E (meV)")
        plt.savefig(filename + "_ds.png"); plt.clf()
        plt.ylim(-0.1, 1.1)
        if t_lim is not None:
            plt.xlim(*t_lim)
        for i in range(_dim):
            plt.scatter(t, ds_occ[:, i], c=s_colors[i])
            plt.plot(t, ds_occ[:, i], label="ds{}".format(i + 1))
        plt.xlabel("t (ps)"); plt.ylabel("occupation (dressed state)"); plt.legend()
        plt.savefig(filename + "_ds_occ.png"); plt.clf()

    populations = np.diagonal(rho, axis1=1, axis2=2)
    if return_eigenvectors:
        return t, populations, e_values, ds_occ, s_colors, n_colors, e_vectors, rho
    return t, populations, e_values, ds_occ, s_colors, n_colors
