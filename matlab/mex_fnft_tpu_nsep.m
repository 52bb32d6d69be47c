% MEX_FNFT_TPU_NSEP Fast nonlinear Fourier transform for the (quasi-)
% periodic nonlinear Schroedinger equation.
%
%   [main_spec, aux_spec] = MEX_FNFT_TPU_NSEP(q, T, kappa)
%   [main_spec, aux_spec] = MEX_FNFT_TPU_NSEP(q, T, kappa, OPTIONAL INPUTS)
%
% DESCRIPTION
%   Interface to fnft_tpu_nsep in libfnft_tpu.so. Option-string protocol
%   compatible with the reference FNFT library's mex_fnft_nsep.
%
% INPUTS
%   q               Complex row vector, D = 2^n samples of one period
%   T               Real 1x2 vector [T0 T1]
%   kappa           +1.0 (focusing) or -1.0 (defocusing)
%
% OPTIONAL INPUTS
%   'phase_shift', s           Quasi-periodic phase shift over one period
%   'loc_mixed'                Mixed localization (default)
%   'loc_subsample_and_refine' Subsample-and-refine localization
%   'loc_gridsearch'           Grid search localization
%   'loc_max_evals', n         Refinement iteration budget
%   'loc_Dsub', d              Subsampled length
%   'filt_none'                Keep all candidate points
%   'filt_manual', [r0 r1 i0 i1]  Keep points inside the bounding box
%   'points_per_spine', n      Spine sampling density
%   'discr_2split2A' etc.      Discretization (see MEX_FNFT_TPU_NSEV)
%   'quiet'                    Suppress warnings
%
% OUTPUTS
%   main_spec       Complex row vector of main-spectrum points
%   aux_spec        Complex row vector of auxiliary-spectrum points
