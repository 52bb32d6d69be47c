% MEX_FNFT_TPU_NSEV Fast nonlinear Fourier transform for the nonlinear
% Schroedinger equation with vanishing boundary conditions.
%
%   contspec = MEX_FNFT_TPU_NSEV(q, T, XI, kappa)
%   [contspec, bound_states] = MEX_FNFT_TPU_NSEV(q, T, XI, kappa)
%   [contspec, bound_states, normconsts] = MEX_FNFT_TPU_NSEV(q, T, XI, ...
%       kappa, OPTIONAL INPUTS)
%
% DESCRIPTION
%   Interface to fnft_tpu_nsev in libfnft_tpu.so (the fnft-tpu framework's
%   C ABI). Option-string protocol compatible with the reference FNFT
%   library's mex_fnft_nsev.
%
% INPUTS
%   q               Complex row vector of D time-domain samples; pass
%                   complex(q) for real signals
%   T               Real 1x2 vector [T0 T1]
%   XI              Real 1x2 vector, bounds of the spectral grid
%   kappa           +1.0 (focusing) or -1.0 (defocusing)
%
% OPTIONAL INPUTS (string tokens, some followed by a value)
%   'M', m                  Number of contspec samples (default D)
%   'cstype_ab'             Return [a(xi) b(xi)] (2M entries) instead of
%                           the reflection coefficient b/a
%   'dstype_residues'       Return residues instead of norming constants
%   'bsloc_fasteigen'       Locate bound states via the polynomial
%                           rootfinder (certified Aberth iteration)
%   'bsloc_newton', z0      Newton refinement from the given complex row
%                           vector of initial guesses
%   'bsloc_subsamp_refine'  Subsample-and-refine localization (default)
%   'bsloc_niter', n        Newton iteration count
%   'bsloc_Dsub', d         Subsampled length for subsample-and-refine
%   'bsfilt_none' | 'bsfilt_basic' | 'bsfilt_full'   Bound-state filtering
%   'discr_2split4B' etc.   Discretization; every scheme of the framework
%                           is reachable as discr_<NAME> ('discr_modal',
%                           'discr_2split2A'...'discr_2split8B',
%                           'discr_4split4B', 'discr_BO', 'discr_CF4_2',
%                           'discr_CF4_3', 'discr_CF5_3', 'discr_CF6_4',
%                           'discr_ES4', 'discr_TES4')
%   'RE'                    Richardson extrapolation
%   'skip_cs' | 'skip_bs' | 'skip_nc'   Skip parts of the computation
%   'quiet'                 Suppress warnings
%
% OUTPUTS
%   contspec        1xM (or 1x2M with 'cstype_ab') complex row vector
%   bound_states    1xK complex row vector (kappa = +1 only)
%   normconsts      1xK complex row vector of norming constants or
%                   residues
