% MEX_FNFT_TPU_NSEV_INVERSE Fast inverse nonlinear Fourier transform for
% the nonlinear Schroedinger equation with vanishing boundaries.
%
%   q = MEX_FNFT_TPU_NSEV_INVERSE(contspec, XI, bound_states, ...
%       normconsts_or_residues, D, T, kappa)
%   q = MEX_FNFT_TPU_NSEV_INVERSE(..., OPTIONAL INPUTS)
%
% DESCRIPTION
%   Interface to fnft_tpu_nsev_inverse in libfnft_tpu.so. Option-string
%   protocol compatible with the reference FNFT library's
%   mex_fnft_nsev_inverse.
%
% INPUTS
%   contspec        Complex row vector of M samples of the chosen
%                   continuous-spectrum representation on the grid from
%                   MEX_FNFT_TPU_NSEV_INVERSE_XI, or [] for pure
%                   multi-soliton synthesis
%   XI              Real 1x2 vector from MEX_FNFT_TPU_NSEV_INVERSE_XI
%   bound_states    Complex row vector, or [] if the discrete spectrum is
%                   empty
%   normconsts_or_residues  Complex row vector, same length as
%                   bound_states, or []
%   D               Number of time-domain samples; a power of two
%   T               Real 1x2 vector [T0 T1]
%   kappa           +1.0 or -1.0
%
% OPTIONAL INPUTS
%   'cstype_reflection_coefficient'   contspec is b/a (default)
%   'cstype_b_of_xi'                  contspec is b(xi)
%   'cstype_B_of_tau'                 contspec is the inverse Fourier
%                                     transform of b
%   'csmethod_tfmatrix_contains_refl_coeff'    TF-matrix method seeded
%                                     with the reflection coefficient
%   'csmethod_tfmatrix_contains_ab_from_iter'  Iterative a/b splitting
%   'csmethod_use_seed_potential_instead'      contspec carries D
%                                     time-domain seed-potential samples
%   'dstype_residues'                 normconsts_or_residues are residues
%   'oversampling_factor', n          Oversampling for the b_of_tau path
%   'discr_2split2A' etc.             Discretization
%   'quiet'                           Suppress warnings
%
% OUTPUTS
%   q               Complex row vector of D time-domain samples
