% MAKE_FNFT_TPU Build the fnft-tpu MEX gateways for MATLAB or GNU Octave.
%
%   Run this script from the matlab/ directory. It expects libfnft_tpu.so
%   to exist next to fnft_tpu/capi/fnft_tpu.h; build it first with
%
%       python -m fnft_tpu.capi.build
%
%   The gateways use the classic separate-complex mx API, so MATLAB
%   R2018a+ needs the -R2017b flag (added automatically below). GNU
%   Octave compiles them with mkoctfile --mex without flags.
%
%   At runtime the gateways embed the Python interpreter recorded at
%   libfnft_tpu.so build time; set FNFT_TPU_PLATFORM=cpu before starting
%   MATLAB if the default JAX platform on your machine cannot execute
%   double-complex programs.

capi = fullfile(fileparts(mfilename('fullpath')), '..', 'fnft_tpu', 'capi');
if ~exist(fullfile(capi, 'libfnft_tpu.so'), 'file')
    error(['libfnft_tpu.so not found; run `python -m fnft_tpu.capi.build` ' ...
           'first']);
end

gateways = {'mex_fnft_tpu_nsev', 'mex_fnft_tpu_nsep', 'mex_fnft_tpu_kdvv', ...
            'mex_fnft_tpu_nsev_inverse', 'mex_fnft_tpu_nsev_inverse_xi', ...
            'mex_fnft_tpu_version'};

is_octave = exist('OCTAVE_VERSION', 'builtin') ~= 0;
for i = 1:numel(gateways)
    src = [gateways{i} '.c'];
    fprintf('building %s...\n', src);
    if is_octave
        mex(src, ['-I' capi], ['-L' capi], '-lfnft_tpu', ...
            ['-Wl,-rpath,' capi]);
    else
        mex('-R2017b', src, ['-I' capi], ['-L' capi], '-lfnft_tpu', ...
            ['LDFLAGS=$LDFLAGS -Wl,-rpath,' capi]);
    end
end
fprintf('done. Try: [XI, xi] = mex_fnft_tpu_nsev_inverse_xi(256, [-16 16], 256)\n');
