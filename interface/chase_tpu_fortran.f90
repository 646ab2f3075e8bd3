!> Fortran iso_c_binding module for libchase_tpu — the reference's
!> chase_fortran_interface.f90 analogue.  Links against the C ABI built by
!> `python -c "from chase_tpu._native import build_capi; build_capi()"`.
!> (No Fortran compiler ships in the build sandbox, so this module is
!> provided as the binding contract and exercised through the C demo,
!> examples/c_interface_demo.c, which uses the identical ABI.)
module chase_tpu_interface
    use iso_c_binding
    implicit none

    interface
        subroutine dchase_init(n, nev, nex, h, ldh, v, ritzv, init) &
            bind(c, name='dchase_init_')
            use iso_c_binding
            integer(c_int) :: n, nev, nex, ldh, init
            real(c_double) :: h(n, *), v(n, *), ritzv(*)
        end subroutine dchase_init

        subroutine schase_init(n, nev, nex, h, ldh, v, ritzv, init) &
            bind(c, name='schase_init_')
            use iso_c_binding
            integer(c_int) :: n, nev, nex, ldh, init
            real(c_float) :: h(n, *), v(n, *), ritzv(*)
        end subroutine schase_init

        subroutine zchase_init(n, nev, nex, h, ldh, v, ritzv, init) &
            bind(c, name='zchase_init_')
            use iso_c_binding
            integer(c_int) :: n, nev, nex, ldh, init
            complex(c_double_complex) :: h(n, *), v(n, *)
            real(c_double) :: ritzv(*)
        end subroutine zchase_init

        subroutine cchase_init(n, nev, nex, h, ldh, v, ritzv, init) &
            bind(c, name='cchase_init_')
            use iso_c_binding
            integer(c_int) :: n, nev, nex, ldh, init
            complex(c_float_complex) :: h(n, *), v(n, *)
            real(c_float) :: ritzv(*)
        end subroutine cchase_init

        subroutine zchase_init_pseudo(n, nev, nex, h, ldh, v, ritzv, init) &
            bind(c, name='zchase_init_pseudo_')
            use iso_c_binding
            integer(c_int) :: n, nev, nex, ldh, init
            complex(c_double_complex) :: h(n, *), v(n, *)
            real(c_double) :: ritzv(*)
        end subroutine zchase_init_pseudo

        subroutine dchase(deg, tol, mode, opt, qr) bind(c, name='dchase_')
            use iso_c_binding
            integer(c_int) :: deg
            real(c_double) :: tol
            character(len=1, kind=c_char) :: mode, opt, qr
        end subroutine dchase

        subroutine zchase(deg, tol, mode, opt, qr) bind(c, name='zchase_')
            use iso_c_binding
            integer(c_int) :: deg
            real(c_double) :: tol
            character(len=1, kind=c_char) :: mode, opt, qr
        end subroutine zchase

        subroutine zchase_pseudo(deg, tol, mode, opt, qr) &
            bind(c, name='zchase_pseudo_')
            use iso_c_binding
            integer(c_int) :: deg
            real(c_double) :: tol
            character(len=1, kind=c_char) :: mode, opt, qr
        end subroutine zchase_pseudo

        subroutine dchase_get_eigenpairs(v, ld, ritzv) &
            bind(c, name='dchase_get_eigenpairs_')
            use iso_c_binding
            integer(c_int) :: ld
            real(c_double) :: v(ld, *), ritzv(*)
        end subroutine dchase_get_eigenpairs

        subroutine zchase_get_eigenpairs(v, ld, ritzv) &
            bind(c, name='zchase_get_eigenpairs_')
            use iso_c_binding
            integer(c_int) :: ld
            complex(c_double_complex) :: v(ld, *)
            real(c_double) :: ritzv(*)
        end subroutine zchase_get_eigenpairs

        subroutine dchase_finalize(flag) bind(c, name='dchase_finalize_')
            use iso_c_binding
            integer(c_int) :: flag
        end subroutine dchase_finalize

        subroutine zchase_finalize(flag) bind(c, name='zchase_finalize_')
            use iso_c_binding
            integer(c_int) :: flag
        end subroutine zchase_finalize

        subroutine chase_set_tol(tol) bind(c, name='chase_set_tol_')
            use iso_c_binding
            real(c_double) :: tol
        end subroutine chase_set_tol

        subroutine chase_set_deg(deg) bind(c, name='chase_set_deg_')
            use iso_c_binding
            integer(c_int) :: deg
        end subroutine chase_set_deg

        subroutine chase_set_max_iter(n) bind(c, name='chase_set_max_iter_')
            use iso_c_binding
            integer(c_int) :: n
        end subroutine chase_set_max_iter
    end interface
end module chase_tpu_interface
